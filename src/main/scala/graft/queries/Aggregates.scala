package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** SURVEY.md §2B.4 — aggregation operators (Q20–Q27).
  *
  * Reference analogue: Fossa itself has no aggregation operators (SURVEY §2A,
  * "explicitly absent"); this is the declared engine contract. All heavy
  * aggregates run as partial+final HashAggregate with map-side combine —
  * shuffle volume is one row per (group × partition), which is what survives
  * a 100 TB scale-up.
  */
object Aggregates {

  /** Q20 flagship — TPC-H Q1 shape: multi-aggregate hash group-by on
    * (l_returnflag, l_linestatus). Exact decimal sums → double at the edge.
    */
  def q20(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val li = t(spark, dir, "lineitem")
    val discPrice = (dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount"))).cast(DecimalType(18, 4))
    val charge = discPrice * (lit(1) + dec2($"l_tax"))
    li.filter($"l_shipdate" <= lit("1998-09-01").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sumDec2($"l_quantity").as("sum_qty"),
        sumDec2($"l_extendedprice").as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(charge).cast(DoubleType).as("sum_charge"),
        (sum(dec2($"l_quantity")).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (sum(dec2($"l_extendedprice")).cast(DoubleType) / count(lit(1))).as("avg_price"),
        (sum(dec2($"l_discount")).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q20Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q21 — global (no-group) aggregate: total revenue scalar. */
  def q21(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .filter($"l_returnflag" =!= "R")
      .agg(
        sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DoubleType).as("total_revenue"),
        count(lit(1)).as("n"))
  }

  val q21Sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue,
      | COUNT(*) AS n
      |FROM lineitem WHERE l_returnflag <> 'R'""".stripMargin

  /** Q22 — exact count-distinct per group (expands to two-phase agg). */
  def q22(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .join(t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey")
      .agg(countDistinct($"c_custkey").as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy($"c_nationkey".asc_nulls_first)
  }

  val q22Sql: String =
    """SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_nationkey ORDER BY c_nationkey NULLS FIRST""".stripMargin

  /** Q23 — approximate count-distinct (HyperLogLog++). Nondeterministic vs
    * DuckDB's HLL, so no hash oracle (driver does the rows>0 smoke check);
    * the ScalaTest spec bounds the relative error against the exact count.
    */
  def q23(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .groupBy($"o_orderstatus")
      .agg(approx_count_distinct($"o_custkey", 0.02).as("approx_cust"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  /** Q24 — rollup + grouping_id (bit-compatible with DuckDB's GROUPING). */
  def q24(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .rollup($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), sumDec2($"o_totalprice").as("sum_price"),
        grouping_id().as("gid"))
      .orderBy($"gid".asc_nulls_first, $"o_orderstatus".asc_nulls_first,
        $"o_orderpriority".asc_nulls_first)
  }

  val q24Sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      | GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY gid NULLS FIRST, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  /** Q25 — collect_list / collect_set (explicitly sorted for determinism —
    * SURVEY §7.4: in-group order is partition-dependent otherwise). The
    * sorted arrays are joined to a scalar string at the output edge: the
    * driver's pandas-based comparator cannot sort/hash ndarray cells
    * (round-1 `TypeError: unhashable type`), and a CSV string carries the
    * identical information.
    */
  def q25(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(
        array_join(transform(sort_array(collect_list($"l_linenumber")),
          _.cast(StringType)), ",").as("lines"),
        array_join(sort_array(collect_set($"l_returnflag")), ",").as("flags"))
      .orderBy($"l_orderkey".asc_nulls_first)
      .limit(2000)
  }

  val q25Sql: String =
    """SELECT l_orderkey,
      | array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
      | array_to_string(list_sort(list(DISTINCT l_returnflag)), ',') AS flags
      |FROM lineitem GROUP BY l_orderkey
      |ORDER BY l_orderkey NULLS FIRST LIMIT 2000""".stripMargin

  /** Q26 — partial+final aggregate semantics: the query is an ordinary
    * group-by; the ScalaTest spec asserts the physical plan contains a
    * map-side partial HashAggregate (shuffle volume = groups × partitions).
    */
  def q26(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n"), sumDec2($"l_quantity").as("sum_qty"))
      .orderBy($"l_suppkey".asc_nulls_first)
  }

  val q26Sql: String =
    """SELECT l_suppkey, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey NULLS FIRST""".stripMargin

  /** Q27 — stddev / variance / median per group. Variance is computed from
    * exact decimal power sums (n, Σx, Σx²) so the double result is the same
    * expression in both engines — the built-in running-variance would be
    * partition-order dependent. Median is Spark's exact `percentile`.
    */
  def q27(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = t(spark, dir, "part")
    p.groupBy($"p_brand")
      .agg(
        count(lit(1)).as("n"),
        sum(dec2($"p_retailprice")).cast(DoubleType).as("s1"),
        sum(dec2($"p_retailprice") * dec2($"p_retailprice")).cast(DoubleType).as("s2"),
        expr("round(percentile(p_retailprice, 0.5), 4)").as("median_price"))
      .select($"p_brand", $"n",
        (($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("var_price"),
        sqrt(($"s2" - $"s1" * $"s1" / $"n") / ($"n" - 1)).as("stddev_price"),
        $"median_price")
      .orderBy($"p_brand".asc_nulls_first)
  }

  val q27Sql: String =
    """SELECT p_brand, n,
      | (s2 - s1 * s1 / n) / (n - 1) AS var_price,
      | SQRT((s2 - s1 * s1 / n) / (n - 1)) AS stddev_price,
      | median_price
      |FROM (
      |  SELECT p_brand, COUNT(*) AS n,
      |   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS s1,
      |   CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) * CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS s2,
      |   ROUND(quantile_cont(p_retailprice, 0.5), 4) AS median_price
      |  FROM part GROUP BY p_brand)
      |ORDER BY p_brand NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_groupby_multi_agg" -> (q20 _),
    "q21_global_agg" -> (q21 _),
    "q22_count_distinct" -> (q22 _),
    "q23_approx_distinct" -> (q23 _),
    "q24_rollup" -> (q24 _),
    "q25_collect_list" -> (q25 _),
    "q26_partial_agg" -> (q26 _),
    "q27_stats_agg" -> (q27 _))

  def oracles: Map[String, String] = Map(
    "q20_groupby_multi_agg" -> q20Sql,
    "q21_global_agg" -> q21Sql,
    "q22_count_distinct" -> q22Sql,
    "q24_rollup" -> q24Sql,
    "q25_collect_list" -> q25Sql,
    "q26_partial_agg" -> q26Sql,
    "q27_stats_agg" -> q27Sql)
}
