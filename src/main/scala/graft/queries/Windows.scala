package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.TopK

/** SURVEY.md §2B.5 — window functions (Q28–Q32).
  *
  * Every window orders by a total order (unique tie-break key) so results
  * are deterministic across partitionings. One shuffle per distinct
  * (partitionBy, orderBy) pair; Q28–Q30 share the (custkey) partitioning so
  * Catalyst reuses the exchange.
  */
object Windows {

  /** Q28 — ranking: row_number / rank / dense_rank / ntile. */
  def q28(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy(dec2($"o_totalprice").desc, $"o_orderkey".asc)
    t(spark, dir, "orders")
      .filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey",
        dec2($"o_totalprice").cast(DoubleType).as("price"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"))
      .orderBy($"o_custkey".asc_nulls_first, $"rn".asc_nulls_first)
  }

  val q28Sql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      | ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk,
      | DENSE_RANK() OVER w AS drk, NTILE(4) OVER w AS quartile
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC)
      |ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** Q29 — analytic: lag / lead / first / last over the partition. */
  def q29(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    t(spark, dir, "orders")
      .filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate",
        lag($"o_orderdate", 1).over(w).as("prev_date"),
        lead($"o_orderdate", 1).over(w).as("next_date"),
        first($"o_orderdate").over(wFull).as("first_date"),
        last($"o_orderdate").over(wFull).as("last_date"))
      .orderBy($"o_custkey".asc_nulls_first, $"o_orderkey".asc_nulls_first)
  }

  val q29Sql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      | LAG(o_orderdate, 1) OVER w AS prev_date,
      | LEAD(o_orderdate, 1) OVER w AS next_date,
      | FIRST_VALUE(o_orderdate) OVER wf AS first_date,
      | LAST_VALUE(o_orderdate) OVER wf AS last_date
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC),
      |       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin

  /** Q30 — ROWS frame: 3-row moving sum/avg (exact decimal inside the
    * frame, double at the edge).
    */
  def q30(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      .rowsBetween(-2, Window.currentRow)
    t(spark, dir, "orders")
      .filter($"o_custkey" < 200)
      .select($"o_custkey", $"o_orderkey",
        sum(dec2($"o_totalprice")).over(w).cast(DoubleType).as("mov_sum"),
        (sum(dec2($"o_totalprice")).over(w).cast(DoubleType) /
          count(lit(1)).over(w)).as("mov_avg"))
      .orderBy($"o_custkey".asc_nulls_first, $"o_orderkey".asc_nulls_first)
  }

  val q30Sql: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS mov_sum,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey NULLS FIRST, o_orderkey NULLS FIRST""".stripMargin

  /** Q31 — RANGE frame on event time: running 7-day sum per user (frame
    * bound in epoch micros; ties included as range peers in both engines).
    */
  def q31(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val sevenDaysUs = 7L * 86400L * 1000000L
    val w = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts"))
      .rangeBetween(-sevenDaysUs, Window.currentRow)
    t(spark, dir, "events")
      .filter($"user_id" < 30)
      .select($"event_id", $"user_id",
        sum($"value".cast(DecimalType(18, 6))).over(w)
          .cast(DoubleType).as("win_sum"),
        count(lit(1)).over(w).as("win_n"))
      .orderBy($"event_id".asc_nulls_first)
  }

  val q31Sql: String =
    """SELECT event_id, user_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS win_sum,
      | COUNT(*) OVER w AS win_n
      |FROM events WHERE user_id < 30
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id NULLS FIRST""".stripMargin

  /** Q32 — top-k per group via [[graft.ops.TopK]] (WindowGroupLimit plan). */
  def q32(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TopK.perGroup(
        t(spark, dir, "orders"), 3,
        partition = Seq($"o_custkey"),
        order = Seq(dec2($"o_totalprice").desc, $"o_orderkey".asc))
      .select($"o_custkey", $"o_orderkey",
        dec2($"o_totalprice").cast(DoubleType).as("price"), $"rn")
      .orderBy($"o_custkey".asc_nulls_first, $"rn".asc_nulls_first)
  }

  val q32Sql: String =
    """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        ROW_NUMBER() OVER (PARTITION BY o_custkey
      |          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey ASC) AS rn
      |      FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey NULLS FIRST, rn NULLS FIRST""".stripMargin

  /** Q78 — distribution windows: ntile / percent_rank / cume_dist per
    * status partition. The (decimal price, orderkey) ordering is total, so
    * every rank function is deterministic; percent_rank and cume_dist are
    * integer-ratio doubles — identical in both engines — rounded to 6dp
    * at the edge anyway.
    */
  def q78(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderstatus")
      .orderBy(dec2($"o_totalprice").asc, $"o_orderkey".asc)
    t(spark, dir, "orders")
      .filter($"o_custkey" < 200)
      .select($"o_orderkey", $"o_orderstatus",
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  val q78Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      | NTILE(4) OVER w AS quartile,
      | ROUND(PERCENT_RANK() OVER w, 6) AS pr,
      | ROUND(CUME_DIST() OVER w, 6) AS cd
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_orderstatus
      |  ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) ASC, o_orderkey ASC)
      |ORDER BY o_orderkey NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_ranking_window" -> (q28 _),
    "q29_analytic_window" -> (q29 _),
    "q30_rows_frame" -> (q30 _),
    "q31_range_frame" -> (q31 _),
    "q32_topk_per_group" -> (q32 _),
    "q78_distribution_window" -> (q78 _))

  def oracles: Map[String, String] = Map(
    "q28_ranking_window" -> q28Sql,
    "q29_analytic_window" -> q29Sql,
    "q30_rows_frame" -> q30Sql,
    "q31_range_frame" -> q31Sql,
    "q32_topk_per_group" -> q32Sql,
    "q78_distribution_window" -> q78Sql)
}
