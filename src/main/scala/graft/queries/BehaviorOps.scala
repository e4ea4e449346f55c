package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.TextOps

/** Round-6 batch 3 (q115–q120): event-sequence analytics (funnel,
  * retention cohorts), deterministic weighted sampling, grouped quantile
  * bands, and the `spark.sql` SQL-text entry path — the product-
  * analytics and curation-sampling shapes layered on the relational
  * core. All oracle-gated against DuckDB.
  */
object BehaviorOps {

  /** Q115 — FUNNEL ANALYSIS: how far each user progresses through the
    * ordered view → click → purchase sequence (each stage must occur
    * STRICTLY AFTER the previous stage's first completion). Three
    * conditional min-aggregations on the same user_id shuffle key — the
    * sequential dependency is expressed as chained `min(when(ts > prev))`
    * over one grouped pass each, never a per-user sort. Output: users
    * per deepest-stage-reached (0 = never viewed).
    */
  def q115(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .select($"user_id", $"event_type", $"ts")
    val t1 = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t_view"))
    val t2 = ev.filter($"event_type" === "click").join(t1, "user_id")
      .filter($"ts" > $"t_view")
      .groupBy($"user_id", $"t_view").agg(min($"ts").as("t_click"))
    val t3 = ev.filter($"event_type" === "purchase").join(t2, "user_id")
      .filter($"ts" > $"t_click")
      .groupBy($"user_id").agg(min($"ts").as("t_buy"))
    val users = ev.select($"user_id").distinct()
    val staged = users
      .join(t1.select($"user_id", lit(1).as("s1")), Seq("user_id"), "left")
      .join(t2.select($"user_id", lit(1).as("s2")), Seq("user_id"), "left")
      .join(t3.select($"user_id", lit(1).as("s3")), Seq("user_id"), "left")
      .select($"user_id",
        (coalesce($"s1", lit(0)) + coalesce($"s2", lit(0))
          + coalesce($"s3", lit(0))).cast(LongType).as("funnel_stage"))
    staged.groupBy($"funnel_stage").agg(count(lit(1)).as("n_users"))
      .orderBy($"funnel_stage".asc_nulls_first)
  }

  val q115Sql: String =
    """WITH ev AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |t1 AS (SELECT user_id, MIN(ts) AS t_view FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |t2 AS (SELECT e.user_id, MIN(e.ts) AS t_click
      |       FROM ev e JOIN t1 ON t1.user_id = e.user_id
      |       WHERE e.event_type = 'click' AND e.ts > t1.t_view GROUP BY e.user_id),
      |t3 AS (SELECT e.user_id, MIN(e.ts) AS t_buy
      |       FROM ev e JOIN t2 ON t2.user_id = e.user_id
      |       WHERE e.event_type = 'purchase' AND e.ts > t2.t_click GROUP BY e.user_id),
      |staged AS (
      |  SELECT u.user_id,
      |    CAST((CASE WHEN t1.user_id IS NULL THEN 0 ELSE 1 END)
      |       + (CASE WHEN t2.user_id IS NULL THEN 0 ELSE 1 END)
      |       + (CASE WHEN t3.user_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS funnel_stage
      |  FROM (SELECT DISTINCT user_id FROM ev) u
      |  LEFT JOIN t1 ON t1.user_id = u.user_id
      |  LEFT JOIN t2 ON t2.user_id = u.user_id
      |  LEFT JOIN t3 ON t3.user_id = u.user_id)
      |SELECT funnel_stage, COUNT(*) AS n_users FROM staged
      |GROUP BY funnel_stage ORDER BY funnel_stage NULLS FIRST""".stripMargin

  /** Q116 — RETENTION COHORTS: users grouped by their first-activity day
    * (the cohort), counted by how many distinct days-since-cohort they
    * returned on (offsets 0..7) — the standard retention triangle. One
    * agg for first-day, one join back (shuffle on user_id both sides),
    * one distinct-count per (cohort, offset); nothing driver-side.
    */
  def q116(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .select($"user_id", to_date($"ts").as("day"))
    val first = ev.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    ev.join(first, "user_id")
      .withColumn("day_offset", datediff($"day", $"cohort_day").cast(LongType))
      .filter($"day_offset" <= 7)
      .groupBy($"cohort_day", $"day_offset")
      .agg(countDistinct($"user_id").as("n_users"))
      .select(date_format($"cohort_day", "yyyy-MM-dd").as("cohort"),
        $"day_offset", $"n_users")
      .orderBy($"cohort".asc_nulls_first, $"day_offset".asc_nulls_first)
  }

  val q116Sql: String =
    """WITH ev AS (SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
      |f AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT strftime(e.cohort_day, '%Y-%m-%d') AS cohort,
      |  CAST(date_diff('day', e.cohort_day, e.day) AS BIGINT) AS day_offset,
      |  COUNT(DISTINCT e.user_id) AS n_users
      |FROM (SELECT ev.user_id, ev.day, f.cohort_day FROM ev JOIN f ON f.user_id = ev.user_id) e
      |WHERE date_diff('day', e.cohort_day, e.day) <= 7
      |GROUP BY 1, 2 ORDER BY cohort NULLS FIRST, day_offset NULLS FIRST""".stripMargin

  /** Q117 — DETERMINISTIC WEIGHTED PRIORITY SAMPLE: draw 200 documents
    * with probability increasing in document length, reproducibly on any
    * engine/run. priority = hash32(doc_id)·10^9 / n_chars in PURE BIGINT
    * arithmetic (no transcendental functions whose last-ulp rounding
    * could diverge between engines), smallest-k priorities win → longer
    * docs draw proportionally more often. The q80/q93 md5 rule's
    * weighted sibling; one scan + one TakeOrdered, no RNG state.
    */
  def q117(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter($"n_chars" > 0)
      .withColumn("h", TextOps.hash32($"doc_id".cast(StringType)))
      // `div` (not `/`): long division stays exact above 2^53, where a
      // double round-trip would corrupt the priority
      .withColumn("priority", expr("(h * 1000000000L) div n_chars"))
      .select($"doc_id", $"lang", $"n_chars", $"priority")
      .orderBy($"priority".asc, $"doc_id".asc).limit(200)
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q117Sql: String =
    """WITH p AS (
      |  SELECT doc_id, lang, n_chars,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |      * 1000000000 // n_chars AS priority
      |  FROM documents WHERE n_chars > 0),
      |top AS (SELECT * FROM p ORDER BY priority ASC, doc_id ASC LIMIT 200)
      |SELECT doc_id, lang, n_chars, priority FROM top
      |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q118 — GROUPED QUANTILE BANDS: per-language p25/p50/p75 of document
    * length, plus how many documents fall in each inter-quantile band —
    * the quality-band bucketing a mixture pipeline uses to stratify its
    * sampling. One grouped percentile agg (memory ∝ per-group NDV, the
    * scale-sane exact shape; see q104 for the approx swap), broadcast
    * back onto one corpus scan, conditional counts — no second shuffle.
    */
  def q118(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val qs = docs.groupBy($"lang").agg(
      round(expr("percentile(n_chars, 0.25)"), 6).as("p25_6"),
      round(expr("percentile(n_chars, 0.5)"), 6).as("p50_6"),
      round(expr("percentile(n_chars, 0.75)"), 6).as("p75_6"))
    docs.join(broadcast(qs), "lang")
      .groupBy($"lang", $"p25_6", $"p50_6", $"p75_6")
      .agg(
        sum(when($"n_chars" <= $"p25_6", 1L).otherwise(0L)).as("n_q1"),
        sum(when($"n_chars" > $"p25_6" && $"n_chars" <= $"p50_6", 1L).otherwise(0L)).as("n_q2"),
        sum(when($"n_chars" > $"p50_6" && $"n_chars" <= $"p75_6", 1L).otherwise(0L)).as("n_q3"),
        sum(when($"n_chars" > $"p75_6", 1L).otherwise(0L)).as("n_q4"))
      .orderBy($"lang".asc_nulls_first)
  }

  val q118Sql: String =
    """WITH q AS (
      |  SELECT lang,
      |    ROUND(quantile_cont(n_chars, 0.25), 6) AS p25_6,
      |    ROUND(quantile_cont(n_chars, 0.5), 6) AS p50_6,
      |    ROUND(quantile_cont(n_chars, 0.75), 6) AS p75_6
      |  FROM documents GROUP BY lang)
      |SELECT d.lang, q.p25_6, q.p50_6, q.p75_6,
      |  CAST(SUM(CASE WHEN d.n_chars <= q.p25_6 THEN 1 ELSE 0 END) AS BIGINT) AS n_q1,
      |  CAST(SUM(CASE WHEN d.n_chars > q.p25_6 AND d.n_chars <= q.p50_6 THEN 1 ELSE 0 END) AS BIGINT) AS n_q2,
      |  CAST(SUM(CASE WHEN d.n_chars > q.p50_6 AND d.n_chars <= q.p75_6 THEN 1 ELSE 0 END) AS BIGINT) AS n_q3,
      |  CAST(SUM(CASE WHEN d.n_chars > q.p75_6 THEN 1 ELSE 0 END) AS BIGINT) AS n_q4
      |FROM documents d JOIN q ON q.lang = d.lang
      |GROUP BY d.lang, q.p25_6, q.p50_6, q.p75_6
      |ORDER BY d.lang NULLS FIRST""".stripMargin

  /** Q123 — the q118 quantile bands on GROUPED APPROX percentiles: one
    * `approx_percentile(n_chars, array(...), 10000)` sketch agg per
    * language instead of three exact `percentile` buffers — the swap a
    * 100 TB mixture pipeline makes because the sketch's state is
    * constant per group while `percentile`'s grows with per-group NDV
    * (see q104 → q122 for the global twin). Approx quantiles land on
    * real data values, not interpolations, so there is no SQL-portable
    * oracle (q23 pattern): the driver records rows>0 and
    * BehaviorOpsSpec bounds each band's population share against the
    * exact q118 twin.
    */
  def q123(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents")
    val qs = docs.groupBy($"lang").agg(
      expr("approx_percentile(n_chars, array(0.25, 0.5, 0.75), 10000)").as("qa"))
      .select($"lang",
        // approx_percentile keeps the input's integer type (it returns a
        // real data value); surface as DOUBLE to match the exact twin
        round($"qa".getItem(0).cast(DoubleType), 6).as("p25_6"),
        round($"qa".getItem(1).cast(DoubleType), 6).as("p50_6"),
        round($"qa".getItem(2).cast(DoubleType), 6).as("p75_6"))
    docs.join(broadcast(qs), "lang")
      .groupBy($"lang", $"p25_6", $"p50_6", $"p75_6")
      .agg(
        sum(when($"n_chars" <= $"p25_6", 1L).otherwise(0L)).as("n_q1"),
        sum(when($"n_chars" > $"p25_6" && $"n_chars" <= $"p50_6", 1L).otherwise(0L)).as("n_q2"),
        sum(when($"n_chars" > $"p50_6" && $"n_chars" <= $"p75_6", 1L).otherwise(0L)).as("n_q3"),
        sum(when($"n_chars" > $"p75_6", 1L).otherwise(0L)).as("n_q4"))
      .orderBy($"lang".asc_nulls_first)
  }

  /** Q120 — SQL-TEXT ENTRY PATH: the user-facing `spark.sql(...)` door —
    * the tables registered as temp views and a TPC-H Q3-shaped query
    * submitted as a SQL STRING (parser → analyzer → Catalyst, same
    * engine as the DataFrame surface). The SQL is written once in the
    * engine's determinism discipline (DECIMAL-exact money math surfaced
    * as DOUBLE, total ORDER BY) and is near-verbatim the DuckDB oracle.
    */
  def q120(spark: SparkSession, dir: String): DataFrame = {
    for (tbl <- Seq("customer", "orders", "lineitem"))
      t(spark, dir, tbl).createOrReplaceTempView(s"graft_$tbl")
    spark.sql(
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM graft_customer c
        |JOIN graft_orders o ON c.c_custkey = o.o_custkey
        |JOIN graft_lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < '1995-03-15'
        |  AND l.l_shipdate > '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin)
  }

  val q120Sql: String =
    """SELECT l_orderkey,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < '1995-03-15'
      |  AND l.l_shipdate > '1995-03-15'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** Q121 — JOIN-KEY SKEW REPORT: per-key cardinality profile of a
    * prospective join key (top-20 hottest keys, each with its exact
    * skew factor = cnt·n_keys/total, i.e. how many times hotter than the
    * mean) — the decision input for q84's salted join and AQE's skew
    * thresholds. One hash-agg for the counts, one 3-number global agg
    * broadcast back, one TakeOrdered: the profile costs one pass however
    * large the fact table is. The skew factor is computed as
    * `cnt·n_keys` in exact i64 BEFORE the one double division so both
    * engines round identically.
    */
  def q121(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val counts = t(spark, dir, "events")
      .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(count(lit(1)).as("n_keys"), sum($"cnt").as("total"))
    counts.crossJoin(broadcast(stats))
      .select($"user_id", $"cnt",
        round(($"cnt" * $"n_keys").cast(DoubleType) / $"total".cast(DoubleType), 6)
          .as("skew6"))
      .orderBy($"cnt".desc, $"user_id".asc).limit(20)
      .withColumn("rank",
        row_number().over(Window.orderBy($"cnt".desc, $"user_id".asc)).cast(LongType))
      .select($"rank", $"user_id", $"cnt", $"skew6")
      .orderBy($"rank".asc_nulls_first)
  }

  val q121Sql: String =
    """WITH c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
      |s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS total FROM c),
      |scored AS (
      |  SELECT c.user_id, c.cnt,
      |    ROUND(CAST(c.cnt * s.n_keys AS DOUBLE) / CAST(s.total AS DOUBLE), 6) AS skew6
      |  FROM c CROSS JOIN s),
      |top AS (SELECT * FROM scored ORDER BY cnt DESC, user_id ASC LIMIT 20)
      |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id ASC) AS rank,
      |  user_id, cnt, skew6
      |FROM top ORDER BY rank NULLS FIRST""".stripMargin

  /** Q128 — BATCH SESSIONIZATION: gap-based session islands over the
    * event stream (a new session starts when a user is idle longer than
    * 30 minutes), the batch twin of the streaming session window (q48)
    * and the canonical first step of behavioral feature pipelines.
    * Classic islands shape ([[graft.ops.Sessionize.byGap]], the op the
    * streaming-equivalence OpsSpec test already pins): lag() flags
    * session starts, a running sum over the same (user_id, ts) window
    * numbers them, then one grouped pass summarises each session. All
    * three steps share the user_id hash partitioning — ONE shuffle
    * end-to-end (the two window operators reuse the sort, the
    * aggregation's (user_id, sess_seq) clustering is satisfied by the
    * user_id distribution); PlanSpec pins the single-exchange shape.
    * Timestamps are compared in epoch microseconds (i64) on both
    * engines, so gap logic and durations are integer-exact.
    */
  def q128(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
      .select($"user_id", $"event_id", $"event_type", $"ts")
    val sess = graft.ops.Sessionize.byGap(ev, $"user_id", $"ts",
      gapSeconds = 1800, sessionCol = "sess_seq")
    sess.groupBy($"user_id", $"sess_seq")
      .agg(count(lit(1)).as("n_events"),
        (max(unix_micros($"ts")) - min(unix_micros($"ts"))).as("duration_us"),
        countDistinct($"event_type").as("n_types"))
      .orderBy($"user_id".asc_nulls_first, $"sess_seq".asc_nulls_first)
  }

  /** Session-boundary flags compare timestamps in epoch MICROseconds
    * (`Sessionize.byGap` uses `unix_micros`; DuckDB side `epoch_us` over
    * the ns→µs cast), so the gap predicate and durations are i64-exact
    * on both engines. The lag/sum windows order by the timestamp only (no
    * tiebreaker): the boundary flags are order-independent under ties
    * (equal timestamps have gap 0), so the per-session sums agree no
    * matter which tie order each engine picks.
    */
  val q128Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |g AS (
      |  SELECT *,
      |    CASE WHEN lag(us) OVER w IS NULL
      |              OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_sess
      |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |s AS (
      |  SELECT *,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us
      |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_seq
      |  FROM g)
      |SELECT user_id, sess_seq, COUNT(*) AS n_events,
      |       MAX(us) - MIN(us) AS duration_us,
      |       COUNT(DISTINCT event_type) AS n_types
      |FROM s GROUP BY user_id, sess_seq
      |ORDER BY user_id NULLS FIRST, sess_seq NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_funnel" -> (q115 _),
    "q116_retention_cohorts" -> (q116 _),
    "q117_weighted_sample" -> (q117 _),
    "q118_quantile_bands" -> (q118 _),
    "q120_sql_text_entry" -> (q120 _),
    "q121_skew_report" -> (q121 _),
    "q123_approx_bands" -> (q123 _),
    "q128_batch_sessionize" -> (q128 _))

  def oracles: Map[String, String] = Map(
    "q115_funnel" -> q115Sql,
    "q116_retention_cohorts" -> q116Sql,
    "q117_weighted_sample" -> q117Sql,
    "q118_quantile_bands" -> q118Sql,
    "q120_sql_text_entry" -> q120Sql,
    "q121_skew_report" -> q121Sql,
    "q128_batch_sessionize" -> q128Sql)
}
