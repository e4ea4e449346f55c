package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** SURVEY.md §2B.2 — projection / filter / predicates (Q06–Q09).
  *
  * All predicates here are Catalyst-pushable: `.explain` shows them inside
  * `PushedFilters` on the parquet scan, and the select list prunes
  * `ReadSchema` to only the referenced columns — at 100 TB that is the
  * difference between scanning 2 columns and scanning 11.
  */
object Projections {

  /** Q06 — project + rename + computed column (exact decimal revenue). */
  def q06(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .select(
        $"l_orderkey".as("okey"),
        $"l_linenumber".as("line"),
        (dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DoubleType).as("revenue"))
      .orderBy($"okey".asc_nulls_first, $"line".asc_nulls_first)
      .limit(100)
  }

  val q06Sql: String =
    """SELECT l_orderkey AS okey, l_linenumber AS line,
      | CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem ORDER BY okey NULLS FIRST, line NULLS FIRST LIMIT 100""".stripMargin

  /** Q07 — filter: comparison, BETWEEN, IN, LIKE, IS NOT NULL, boolean ops. */
  def q07(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .filter(
        $"o_orderdate".between(
          lit("1996-01-01").cast(TimestampType),
          lit("1998-12-31").cast(TimestampType)) &&
        $"o_orderstatus".isin("F", "O") &&
        ($"o_orderpriority".like("1-%") || $"o_orderpriority".like("2-%")) &&
        $"o_totalprice".isNotNull &&
        !($"o_custkey" === 0))
      .agg(
        count(lit(1)).as("n"),
        sumDec2($"o_totalprice").as("sum_price"),
        min($"o_orderkey").as("min_key"),
        max($"o_orderkey").as("max_key"))
  }

  val q07Sql: String =
    """SELECT COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      | MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1998-12-31 00:00:00'
      |  AND o_orderstatus IN ('F','O')
      |  AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      |  AND o_totalprice IS NOT NULL
      |  AND NOT (o_custkey = 0)""".stripMargin

  /** Q08 — conditional expressions: CASE/WHEN, coalesce, nullif,
    * greatest/least (price tiering).
    */
  def q08(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val price = dec2($"o_totalprice")
    t(spark, dir, "orders")
      .select(
        when(price < 50000, "low")
          .when(price < 150000, "mid")
          .otherwise("high").as("tier"),
        // nullif collapses the 'O' status; coalesce restores a marker
        coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status"),
        greatest(least(price, lit(400000)), lit(2000)).cast(DoubleType).as("clamped"))
      .groupBy($"tier", $"status")
      .agg(count(lit(1)).as("n"),
        sum(dec2($"clamped")).cast(DoubleType).as("sum_clamped"))
      .orderBy($"tier".asc_nulls_first, $"status".asc_nulls_first)
  }

  val q08Sql: String =
    """SELECT tier, status, COUNT(*) AS n,
      | CAST(SUM(CAST(clamped AS DECIMAL(18,2))) AS DOUBLE) AS sum_clamped
      |FROM (
      |  SELECT CASE WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 50000 THEN 'low'
      |              WHEN CAST(o_totalprice AS DECIMAL(18,2)) < 150000 THEN 'mid'
      |              ELSE 'high' END AS tier,
      |         COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status,
      |         CAST(GREATEST(LEAST(CAST(o_totalprice AS DECIMAL(18,2)), 400000), 2000) AS DOUBLE) AS clamped
      |  FROM orders)
      |GROUP BY tier, status ORDER BY tier NULLS FIRST, status NULLS FIRST""".stripMargin

  /** Q09 — distinct projection (dropDuplicates on a column subset). */
  def q09(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "customer")
      .select($"c_nationkey", $"c_mktsegment")
      .distinct()
      .orderBy($"c_nationkey".asc_nulls_first, $"c_mktsegment".asc_nulls_first)
  }

  val q09Sql: String =
    """SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
      |ORDER BY c_nationkey NULLS FIRST, c_mktsegment NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q06_project_compute" -> (q06 _),
    "q07_filter_predicates" -> (q07 _),
    "q08_conditional_expr" -> (q08 _),
    "q09_distinct" -> (q09 _))

  def oracles: Map[String, String] = Map(
    "q06_project_compute" -> q06Sql,
    "q07_filter_predicates" -> q07Sql,
    "q08_conditional_expr" -> q08Sql,
    "q09_distinct" -> q09Sql)
}
