package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.functions.Udx
import graft.ops.TextOps

/** SURVEY.md §2B.10 — UDF / UDAF / UDTF extension points (Q54–Q56).
  * (Q57, the whole-model hook, lives with the exec layer —
  * [[graft.queries.ModelQueries]].)
  */
object Extensibility {

  /** Q54 — scalar UDF (price density). */
  def q54(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val density = udf(Udx.priceDensity)
    t(spark, dir, "part")
      .select($"p_partkey", density($"p_retailprice", $"p_size").as("density"))
      .orderBy($"p_partkey".asc_nulls_first)
      .limit(300)
  }

  val q54Sql: String =
    """SELECT p_partkey, ROUND(p_retailprice / (p_size + 1), 6) AS density
      |FROM part ORDER BY p_partkey NULLS FIRST LIMIT 300""".stripMargin

  /** Q55 — typed Aggregator UDAF: XOR digest of portable 32-bit name
    * hashes per nation (order-insensitive → exact partial agg).
    */
  def q55(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val xorAgg = udaf(Udx.XorAgg)
    t(spark, dir, "customer")
      .withColumn("h", TextOps.hash32($"c_name"))
      .groupBy($"c_nationkey")
      .agg(xorAgg($"h").as("digest"), count(lit(1)).as("n"))
      .orderBy($"c_nationkey".asc_nulls_first)
  }

  val q55Sql: String =
    """SELECT c_nationkey,
      | bit_xor(CAST(('0x' || substr(md5(c_name),1,8)) AS BIGINT)) AS digest,
      | COUNT(*) AS n
      |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey NULLS FIRST""".stripMargin

  /** Q56 — UDTF/generator: typed flatMap exploding docs into positioned
    * tokens (Dataset-native row generator).
    */
  def q56(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents")
      .filter($"doc_id" < 50)
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .flatMap { case (id, text) => Udx.tokenize(id, text) }
      .toDF("doc_id", "pos", "token")
      .orderBy($"doc_id".asc_nulls_first, $"pos".asc_nulls_first)
  }

  val q56Sql: String =
    """SELECT doc_id, generate_subscripts(toks, 1) AS pos, unnest(toks) AS token
      |FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '') AS toks
      |      FROM documents WHERE doc_id < 50)
      |ORDER BY doc_id NULLS FIRST, pos NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_scalar_udf" -> (q54 _),
    "q55_udaf_aggregator" -> (q55 _),
    "q56_udtf_flatmap" -> (q56 _))

  def oracles: Map[String, String] = Map(
    "q54_scalar_udf" -> q54Sql,
    "q55_udaf_aggregator" -> q55Sql,
    "q56_udtf_flatmap" -> q56Sql)
}
