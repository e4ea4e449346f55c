package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Aggregation point for the t2 query surface (SURVEY.md §2B). Each module
  * contributes `all` (Spark plans) and `oracles` (DuckDB-equivalent SQL).
  */
object Registry {
  private def modules: Seq[QueryModule] = Seq(
    // populated as slices land (SURVEY §7.2)
  )

  def all: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.all ++ modules.flatMap(_.all).toMap

  def oracles: Map[String, String] =
    Aggregates.oracles ++ modules.flatMap(_.oracles).toMap
}

trait QueryModule {
  def all: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
