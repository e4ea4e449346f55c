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

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q20_groupby_multi_agg" -> (q20 _)
  )

  def oracles: Map[String, String] = Map(
    "q20_groupby_multi_agg" -> q20Sql
  )
}
