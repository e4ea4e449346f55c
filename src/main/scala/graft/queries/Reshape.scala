package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** Reshaping operators — pivot (long→wide) and unpivot/melt (wide→long).
  *
  * Pivot values are declared explicitly (the o_orderpriority domain):
  * at scale, value-list discovery would add a full pass over the data and
  * an unbounded-width schema; a declared domain keeps the plan a single
  * partial+final hash aggregate with a fixed output schema. Spaces are
  * normalised out of the pivoted column names (parquet field-name rules).
  */
object Reshape {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT_SPECIFIED", "5-LOW")

  /** Q76 — pivot: revenue per order status × priority, one column per
    * priority value. Single aggregate pass (no join, no extra shuffle vs
    * the plain group-by).
    */
  def q76(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .withColumn("o_orderpriority", translate($"o_orderpriority", " ", "_"))
      .groupBy($"o_orderstatus")
      .pivot("o_orderpriority", priorities)
      .agg(sumDec2($"o_totalprice"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  val q76Sql: String = {
    val cells = priorities.map { p =>
      s"""CAST(SUM(CASE WHEN translate(o_orderpriority, ' ', '_') = '$p'
         |  THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "$p"""".stripMargin
    }.mkString(",\n ")
    s"""SELECT o_orderstatus,
       | $cells
       |FROM orders GROUP BY o_orderstatus
       |ORDER BY o_orderstatus NULLS FIRST""".stripMargin
  }

  /** Q77 — unpivot/melt: the q76 wide frame back to long
    * (status, priority, sum_price) rows, nulls dropped — proving the
    * round-trip. Unpivot is a generate-style projection: per-row fan-out,
    * no shuffle.
    */
  def q77(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    q76(spark, dir)
      .unpivot(Array($"o_orderstatus"), priorities.map(col).toArray,
        "o_orderpriority", "sum_price")
      .filter($"sum_price".isNotNull)
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  val q77Sql: String =
    """SELECT o_orderstatus, translate(o_orderpriority, ' ', '_') AS o_orderpriority,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_pivot" -> (q76 _),
    "q77_unpivot" -> (q77 _))

  def oracles: Map[String, String] = Map(
    "q76_pivot" -> q76Sql,
    "q77_unpivot" -> q77Sql)
}
