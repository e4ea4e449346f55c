package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** SURVEY.md §2B.6 — sorts / limits / top-k (Q33–Q35).
  *
  * Global top-k compiles to `TakeOrderedAndProject` — per-partition heaps of
  * size k, merged on the driver; no full shuffle-sort even at 100 TB.
  * Full sorts use Spark's range-partitioned external sort (spills to disk).
  */
object SortsLimits {

  /** Q33 — multi-key sort asc/desc with NULLS FIRST/LAST (nulls synthesized
    * via nullif since the test data is null-free).
    */
  def q33(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select(
        nullif($"o_orderstatus", lit("P")).as("status_n"),
        $"o_orderpriority", $"o_orderkey")
      .orderBy(
        $"status_n".asc_nulls_first,
        $"o_orderpriority".desc_nulls_last,
        $"o_orderkey".asc_nulls_first)
      .limit(50)
  }

  val q33Sql: String =
    """SELECT NULLIF(o_orderstatus, 'P') AS status_n, o_orderpriority, o_orderkey
      |FROM orders
      |ORDER BY status_n ASC NULLS FIRST, o_orderpriority DESC NULLS LAST,
      |         o_orderkey ASC NULLS FIRST
      |LIMIT 50""".stripMargin

  /** Q34 — limit + offset over a total order. */
  def q34(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select($"o_orderkey", dec2($"o_totalprice").cast("double").as("price"))
      .orderBy($"price".desc_nulls_last, $"o_orderkey".asc_nulls_first)
      .offset(20)
      .limit(20)
  }

  val q34Sql: String =
    """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders
      |ORDER BY price DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      |LIMIT 20 OFFSET 20""".stripMargin

  /** Q35 — global top-k (TakeOrderedAndProject). */
  def q35(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey",
        dec2($"o_totalprice").cast("double").as("price"))
      .orderBy($"price".desc_nulls_last, $"o_orderkey".asc_nulls_first)
      .limit(10)
  }

  val q35Sql: String =
    """SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
      |FROM orders
      |ORDER BY price DESC NULLS LAST, o_orderkey ASC NULLS FIRST
      |LIMIT 10""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q33_multikey_sort" -> (q33 _),
    "q34_limit_offset" -> (q34 _),
    "q35_global_topk" -> (q35 _))

  def oracles: Map[String, String] = Map(
    "q33_multikey_sort" -> q33Sql,
    "q34_limit_offset" -> q34Sql,
    "q35_global_topk" -> q35Sql)
}
