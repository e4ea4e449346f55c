package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._

/** SURVEY.md §2B.7 — set operations (Q36–Q38).
  *
  * `intersect`/`except` plan as left-semi/left-anti joins after a distinct
  * aggregate — shuffle on the compared columns only. `intersectAll`/
  * `exceptAll` keep multiplicities via a count-tagged join.
  */
object SetOps {

  /** Q36 — union all + union distinct of customer vs supplier nations. */
  def q36(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
    val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
    val unionAllN = c.unionAll(s).count()
    val unionDistinctN = c.union(s).distinct().count()
    c.sparkSession.range(1).select(
      lit(unionAllN).as("n_union_all"),
      lit(unionDistinctN).as("n_union_distinct"))
  }

  val q36Sql: String =
    """SELECT
      | (SELECT COUNT(*) FROM (SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier)) AS n_union_all,
      | (SELECT COUNT(*) FROM (SELECT c_nationkey AS nk FROM customer UNION SELECT s_nationkey FROM supplier)) AS n_union_distinct""".stripMargin

  /** Q37 — intersect + intersectAll. */
  def q37(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
    val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
    c.intersect(s)
      .orderBy($"nk".asc_nulls_first)
  }

  val q37Sql: String =
    """SELECT nk FROM (SELECT c_nationkey AS nk FROM customer
      |INTERSECT SELECT s_nationkey FROM supplier) ORDER BY nk NULLS FIRST""".stripMargin

  /** Q38 — except (distinct) + exceptAll count: nations with customers but
    * no suppliers.
    */
  def q38(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val c = t(spark, dir, "customer").select($"c_nationkey".as("nk"))
    val s = t(spark, dir, "supplier").select($"s_nationkey".as("nk"))
    val exceptAllN = c.exceptAll(s).count()
    c.except(s)
      .withColumn("n_except_all", lit(exceptAllN))
      .orderBy($"nk".asc_nulls_first)
  }

  val q38Sql: String =
    """SELECT nk,
      | (SELECT COUNT(*) FROM (SELECT c_nationkey AS nk FROM customer
      |   EXCEPT ALL SELECT s_nationkey FROM supplier)) AS n_except_all
      |FROM (SELECT c_nationkey AS nk FROM customer
      |      EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY nk NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_union" -> (q36 _),
    "q37_intersect" -> (q37 _),
    "q38_except" -> (q38 _))

  def oracles: Map[String, String] = Map(
    "q36_union" -> q36Sql,
    "q37_intersect" -> q37Sql,
    "q38_except" -> q38Sql)
}
