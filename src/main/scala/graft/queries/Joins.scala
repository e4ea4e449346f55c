package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.AsOfJoin

/** SURVEY.md §2B.3 — joins (Q10–Q19).
  *
  * Strategy notes (the 100 TB posture):
  *  - dimension tables (region/nation/part at our ratios) are broadcast —
  *    no shuffle of the fact side;
  *  - fact-fact joins (orders⋈customer, lineitem⋈orders) shuffle on the
  *    key and are AQE-skew-handled;
  *  - the non-equi joins (Q15) are kept bounded (dim × dim) — at scale a
  *    banded equi-key prefilter would bound the pair blow-up;
  *  - the as-of join (Q17) is the union+window single-shuffle pattern from
  *    [[graft.ops.AsOfJoin]], not a range-join blow-up.
  */
object Joins {

  /** Q10 — inner equi-join, Catalyst picks the physical strategy. */
  def q10(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey", "inner")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), sumDec2($"o_totalprice").as("sum_price"))
      .orderBy($"c_mktsegment".asc_nulls_first)
  }

  val q10Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment NULLS FIRST""".stripMargin

  /** Q11 — explicit broadcast join: lineitem ⋈ broadcast(part). */
  def q11(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n"),
        sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DoubleType).as("revenue"))
      .orderBy($"p_brand".asc_nulls_first)
  }

  val q11Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand NULLS FIRST""".stripMargin

  /** Q12 — left + full outer join with genuinely unmatched rows on both
    * sides (key-range filters create them).
    */
  def q12(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer").filter($"c_custkey" >= 100)
    val o = t(spark, dir, "orders").filter($"o_custkey" < 1300)
    c.join(o, $"c_custkey" === $"o_custkey", "full_outer")
      .groupBy(
        $"c_custkey".isNull.as("cust_missing"),
        $"o_orderkey".isNull.as("order_missing"))
      .agg(count(lit(1)).as("n"),
        count($"o_orderkey").as("n_orders"),
        countDistinct($"c_custkey").as("n_cust"))
      .orderBy($"cust_missing".asc_nulls_first, $"order_missing".asc_nulls_first)
  }

  val q12Sql: String =
    """SELECT c_custkey IS NULL AS cust_missing, o_orderkey IS NULL AS order_missing,
      | COUNT(*) AS n, COUNT(o_orderkey) AS n_orders, COUNT(DISTINCT c_custkey) AS n_cust
      |FROM (SELECT * FROM customer WHERE c_custkey >= 100) c
      |FULL OUTER JOIN (SELECT * FROM orders WHERE o_custkey < 1300) o
      |  ON c_custkey = o_custkey
      |GROUP BY 1, 2 ORDER BY cust_missing NULLS FIRST, order_missing NULLS FIRST""".stripMargin

  /** Q13 — left semi: customers having ≥1 big order. */
  def q13(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bigOrders = t(spark, dir, "orders").filter(dec2($"o_totalprice") > lit(450000))
    t(spark, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_nationkey")
      .orderBy($"c_custkey".asc_nulls_first)
  }

  val q13Sql: String =
    """SELECT c_custkey, c_nationkey FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 450000)
      |ORDER BY c_custkey NULLS FIRST""".stripMargin

  /** Q14 — left anti: customers with no order at all. */
  def q14(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .join(t(spark, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_mktsegment")
      .orderBy($"c_custkey".asc_nulls_first)
  }

  val q14Sql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
      |ORDER BY c_custkey NULLS FIRST""".stripMargin

  /** Q15 — theta (non-equi) join as a BANDED equi-join: the naive form is a
    * BroadcastNestedLoopJoin evaluating O(|part|·|supplier|) pairs — a
    * scale-killer at 100 TB. Instead we derive a band-bucket key: the band
    * `p_retailprice ∈ (center-5, center+5]` has width 10, so with bucket
    * width 10 every supplier band spans exactly two consecutive buckets.
    * Explode supplier to those two bucket keys, hash-equi-join on the
    * bucket, and post-filter the exact band predicate. All band arithmetic
    * is DECIMAL (exact in both engines) per the determinism contract.
    */
  def q15(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = t(spark, dir, "part")
      .select($"p_partkey", dec2($"p_retailprice").as("p_price"))
      .withColumn("band_bucket", floor($"p_price" / 10))
    val s = t(spark, dir, "supplier")
      .select($"s_suppkey", (dec2($"s_acctbal") / 10).as("center"))
      // width-10 band over width-10 buckets → exactly these two buckets
      .withColumn("band_bucket",
        explode(array(floor(($"center" - 5) / 10), floor(($"center" + 5) / 10))))
    p.join(s, Seq("band_bucket"))
      .filter($"p_price" > $"center" - 5 && $"p_price" <= $"center" + 5)
      .agg(count(lit(1)).as("n_pairs"),
        sum($"p_partkey").as("sum_pkey"),
        sum($"s_suppkey").as("sum_skey"))
  }

  // DuckDB SUM(BIGINT) yields HUGEINT, which pandas reads back as float64
  // and the driver's row-hash then sees 1723458.0 vs Spark's 1723458 —
  // CAST back to BIGINT so both frames carry int64.
  val q15Sql: String =
    """SELECT COUNT(*) AS n_pairs,
      | CAST(SUM(p_partkey) AS BIGINT) AS sum_pkey,
      | CAST(SUM(s_suppkey) AS BIGINT) AS sum_skey
      |FROM part, supplier
      |WHERE CAST(p_retailprice AS DECIMAL(18,2)) > CAST(s_acctbal AS DECIMAL(18,2)) / 10 - 5
      |  AND CAST(p_retailprice AS DECIMAL(18,2)) <= CAST(s_acctbal AS DECIMAL(18,2)) / 10 + 5""".stripMargin

  /** Q16 — cross join (explicit cartesian). */
  def q16(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "region").select($"r_name")
      .crossJoin(t(spark, dir, "nation").select($"n_name"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }

  val q16Sql: String =
    """SELECT r_name, n_name FROM region CROSS JOIN nation
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin

  /** Q17 — as-of join via the single-shuffle union+window pattern
    * ([[graft.ops.AsOfJoin]]): per sampled event, the most recent order
    * date (≤ ts) of that user.
    */
  def q17(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .filter($"event_id" % 50 === 0)
      .select($"event_id", $"user_id", $"ts")
    val ord = t(spark, dir, "orders")
      .select($"o_custkey".as("user_id"), $"o_orderdate")
    AsOfJoin.asOf(ev, ord, key = "user_id",
        leftTime = "ts", rightTime = "o_orderdate",
        valueCol = "o_orderdate", outCol = "asof_orderdate")
      .select($"event_id", $"user_id", $"asof_orderdate")
      .orderBy($"event_id".asc_nulls_first)
  }

  val q17Sql: String =
    """SELECT e.event_id, e.user_id,
      | (SELECT MAX(o.o_orderdate) FROM orders o
      |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts) AS asof_orderdate
      |FROM events e WHERE e.event_id % 50 = 0
      |ORDER BY e.event_id NULLS FIRST""".stripMargin

  /** Q18 — interval / point-in-range join: lineitems shipped within 30 days
    * of their order date (equi key + range predicate — shuffles on the equi
    * key only, the range is a post-join filter).
    */
  def q18(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem").select($"l_orderkey", $"l_linenumber", $"l_shipdate")
    val ord = t(spark, dir, "orders").select($"o_orderkey", $"o_orderdate", $"o_orderstatus")
    li.join(ord,
        $"l_orderkey" === $"o_orderkey" &&
        $"l_shipdate" >= $"o_orderdate" &&
        $"l_shipdate" < $"o_orderdate" + expr("INTERVAL 30 DAYS"))
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_in_window"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  val q18Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_in_window,
      | COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      | AND l_shipdate >= o_orderdate
      | AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      |GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q19 — multi-way star join (TPC-H Q5 shape): region→nation→customer→
    * orders→lineitem, dims broadcast, facts shuffled once on their keys.
    */
  def q19(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val revenue = (dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"),
        $"l_orderkey" === $"o_orderkey")
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1998-01-01").cast(TimestampType))
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t(spark, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(sum(revenue).cast(DoubleType).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy($"revenue".desc_nulls_last, $"n_name".asc_nulls_first)
  }

  val q19Sql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC NULLS LAST, n_name NULLS FIRST""".stripMargin

  /** Q84 — skew-salted fact-fact join: lineitem (salted 8 ways) ⋈ orders
    * (replicated 8×) on the order key, then an aggregate. The explicit
    * tool for a hot key the planner can't see (AQE skew-join covers the
    * runtime-detectable case): the hot key's rows spread over `salts`
    * reducers instead of stalling one. The salt is derived, used only for
    * load-spreading, and dropped — the result is identical to the plain
    * join, which is exactly what the oracle checks.
    */
  def q84(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val l = t(spark, dir, "lineitem")
      .select($"l_orderkey".as("k"), dec2($"l_extendedprice").as("price"))
    val o = t(spark, dir, "orders")
      .select($"o_orderkey".as("k"), $"o_orderpriority")
    graft.ops.ScaleJoins.saltedInnerJoin(l, o, "k", salts = 8)
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), sum($"price").cast(DoubleType).as("sum_price"))
      .orderBy($"o_orderpriority".asc_nulls_first)
  }

  val q84Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority NULLS FIRST""".stripMargin

  /** Q85 — persistent co-located layout: customer and orders written as
    * bucketed+sorted catalog tables on the customer key, then a
    * sort-merge join that plans with NO shuffle exchange (bucket-local
    * merge; asserted in PlanSpec). This is the repeated-fact-fact-join
    * answer at 100 TB: pay the shuffle ONCE at ingest, never per query —
    * so the ingest is memoized per source dir (bench reps measure the
    * co-located join, exactly the pattern's production economics; noted
    * in BASELINE.md). The oracle sees only the join semantics — layout
    * must not change results.
    */
  private val bucketedFor = new java.util.concurrent.atomic.AtomicReference("")

  def q85(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // re-ingest when the dir changes OR the tables are missing from this
    // session's catalog (a fresh session in the same JVM starts empty —
    // the memo alone must not skip ingest it never did)
    def tablesReady = spark.catalog.tableExists("graft_bkt_customer") &&
      spark.catalog.tableExists("graft_bkt_orders")
    if (bucketedFor.get != dir || !tablesReady) bucketedFor.synchronized {
      if (bucketedFor.get != dir || !tablesReady) {
        graft.ops.ScaleJoins.writeBucketed(
          t(spark, dir, "customer").select($"c_custkey", $"c_mktsegment"),
          "graft_bkt_customer", "c_custkey", buckets = 8)
        graft.ops.ScaleJoins.writeBucketed(
          t(spark, dir, "orders")
            .select($"o_custkey", $"o_orderstatus", dec2($"o_totalprice").as("price")),
          "graft_bkt_orders", "o_custkey", buckets = 8)
        bucketedFor.set(dir)
      }
    }
    spark.table("graft_bkt_customer")
      .join(spark.table("graft_bkt_orders").hint("merge"),
        $"c_custkey" === $"o_custkey")
      .groupBy($"c_mktsegment", $"o_orderstatus")
      .agg(count(lit(1)).as("n"), sum($"price").cast(DoubleType).as("sum_price"))
      .orderBy($"c_mktsegment".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  val q85Sql: String =
    """SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment, o_orderstatus
      |ORDER BY c_mktsegment NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin

  /** Q124 — AUTO-SALTED join: the q121 skew report folded into the q84
    * decision — measure the fact side's key distribution, then join
    * plain or salted-k by threshold
    * ([[graft.ops.ScaleJoins.decideFromCounts]]). The oracle is the
    * PLAIN join SQL because the result is identical under either choice
    * (the whole point: the decision changes the layout, never the
    * answer). On this corpus user_id is near-uniform so the plain path
    * runs; OpsSpec flips the decision on a synthetic hot key.
    *
    * Plan shape: ONE key-counts shuffle (cached, ~one row per user)
    * serves BOTH the decision aggregate and the per-user dim derived
    * from it — the fused measure-then-use pass; the dim then broadcasts
    * onto a single scan of the fact side, so the corpus itself never
    * shuffles on the plain path.
    */
  def q124(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.ops.ScaleJoins
    val e = t(spark, dir, "events").select($"user_id", dec2($"value").as("v"))
    val counts = graft.core.CacheScope.track(ScaleJoins.keyCounts(e, "user_id"))
    val d = ScaleJoins.decideFromCounts(counts)
    val dim = counts.select($"user_id",
      pmod($"user_id", lit(10L)).cast(LongType).as("cohort"))
    val joined =
      if (d.salted) ScaleJoins.saltedInnerJoin(e, dim, "user_id", d.salts)
      else e.join(broadcast(dim), Seq("user_id"), "inner")
    joined.groupBy($"cohort")
      .agg(count(lit(1)).as("n"), sum($"v").cast(DoubleType).as("sum_value"))
      .orderBy($"cohort".asc_nulls_first)
  }

  val q124Sql: String =
    """WITH dim AS (SELECT DISTINCT user_id, CAST(user_id % 10 AS BIGINT) AS cohort FROM events)
      |SELECT d.cohort, COUNT(*) AS n,
      |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN dim d ON d.user_id = e.user_id
      |GROUP BY d.cohort ORDER BY cohort NULLS FIRST""".stripMargin

  /** Q92 — Bloom-pruned fact⋈dim join: a Bloom filter over the selected
    * part keys prunes lineitem BEFORE the join
    * ([[graft.ops.ScaleJoins.bloomPrunedInnerJoin]]). The result is
    * provably identical to the plain join (false positives die in the
    * exact join), which is exactly what the oracle checks; the plan
    * assertion (PlanSpec) pins the probe onto the fact-side scan. At
    * 100 TB this is the difference between shuffling all of lineitem and
    * shuffling the ~2% whose part survives the predicate.
    */
  def q92(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val small = t(spark, dir, "part")
      .filter($"p_size" === 1)
      .select($"p_partkey", $"p_brand")
    val big = t(spark, dir, "lineitem")
      .select($"l_partkey", dec2($"l_extendedprice").as("price"))
    graft.ops.ScaleJoins
      .bloomPrunedInnerJoin(big, small, "l_partkey", "p_partkey", fpp = 0.01)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), sum($"price").cast(DoubleType).as("sum_price"))
      .orderBy($"p_brand".asc_nulls_first)
  }

  val q92Sql: String =
    """SELECT p_brand, COUNT(*) AS n,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size = 1
      |GROUP BY p_brand ORDER BY p_brand NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_inner_join" -> (q10 _),
    "q11_broadcast_join" -> (q11 _),
    "q12_outer_join" -> (q12 _),
    "q13_semi_join" -> (q13 _),
    "q14_anti_join" -> (q14 _),
    "q15_theta_join" -> (q15 _),
    "q16_cross_join" -> (q16 _),
    "q17_asof_join" -> (q17 _),
    "q18_interval_join" -> (q18 _),
    "q19_star_join" -> (q19 _),
    "q84_salted_skew_join" -> (q84 _),
    "q85_bucketed_join" -> (q85 _),
    "q92_bloom_pruned_join" -> (q92 _),
    "q124_auto_salt_join" -> (q124 _))

  def oracles: Map[String, String] = Map(
    "q10_inner_join" -> q10Sql,
    "q11_broadcast_join" -> q11Sql,
    "q12_outer_join" -> q12Sql,
    "q13_semi_join" -> q13Sql,
    "q14_anti_join" -> q14Sql,
    "q15_theta_join" -> q15Sql,
    "q16_cross_join" -> q16Sql,
    "q17_asof_join" -> q17Sql,
    "q18_interval_join" -> q18Sql,
    "q19_star_join" -> q19Sql,
    "q84_salted_skew_join" -> q84Sql,
    "q85_bucketed_join" -> q85Sql,
    "q92_bloom_pruned_join" -> q92Sql,
    "q124_auto_salt_join" -> q124Sql)
}
