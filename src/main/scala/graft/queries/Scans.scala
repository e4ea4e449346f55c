package graft.queries

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** SURVEY.md §2B.1 — scans, sources and sinks (Q01–Q05).
  *
  * Reference analogue: ayeaye `Connect` engine-url connectors
  * (reference examples/example_etl.py:139-143 CSV write,
  * :56-61 templated per-subtask datasets). Here the source/sink layer is
  * Spark's DataSource V2: parquet/csv/json scans push column pruning and
  * predicates into the file reader, and partitioned sinks
  * (`partitionBy`) are the per-key dataset analogue.
  *
  * Scale notes: round-trips write to a scratch dir sized by the input; at
  * cluster scale the same code path shards writes one-file-per-task and the
  * re-read prunes partitions (Q05's read-back of one `o_orderstatus` would
  * touch 1/3 of the files).
  */
object Scans {

  private def scratch(sub: String): String = {
    val base = sys.props.getOrElse("java.io.tmpdir", "/tmp")
    s"$base/graft_scratch/$sub"
  }

  /** Q01 — parquet scan: full-table row count + exact checksum. */
  def q01(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      sumDec2($"l_quantity").as("sum_qty"),
      sumDec2($"l_extendedprice").as("sum_price"))
  }

  val q01Sql: String =
    """SELECT COUNT(*) AS n_rows,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM lineitem""".stripMargin

  /** Q02 — CSV sink + scan with explicit schema (header round-trip). */
  def q02(spark: SparkSession, dir: String): DataFrame = {
    val out = scratch("q02_region_csv")
    t(spark, dir, "region")
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(out)
    val schema = StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType)))
    spark.read.option("header", "true").schema(schema).csv(out)
      .orderBy(col("r_regionkey").asc_nulls_first)
  }

  val q02Sql: String =
    "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey NULLS FIRST"

  /** Q03 — JSON(L) sink + schema-on-read scan. */
  def q03(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratch("q03_events_json")
    t(spark, dir, "events")
      .filter($"event_id" < 500)
      .select($"event_id", $"event_type", $"value")
      .write.mode(SaveMode.Overwrite).json(out)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    spark.read.schema(schema).json(out)
      .orderBy($"event_id".asc_nulls_first)
  }

  val q03Sql: String =
    """SELECT event_id, event_type, value FROM events
      |WHERE event_id < 500 ORDER BY event_id NULLS FIRST""".stripMargin

  /** Q04 — parquet sink round-trip stability. */
  def q04(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratch("q04_orders_parquet")
    t(spark, dir, "orders")
      .filter(dec2($"o_totalprice") > lit(250000))
      .write.mode(SaveMode.Overwrite).parquet(out)
    spark.read.parquet(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sumDec2($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  val q04Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders WHERE CAST(o_totalprice AS DECIMAL(18,2)) > 250000
      |GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q05 — partitioned (per-key) sink: `partitionBy` is the Spark shape of
    * the reference's one-dataset-per-subtask pattern
    * (examples/example_etl.py:56-61). Re-read prunes by partition dir.
    */
  def q05(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratch("q05_orders_by_status")
    t(spark, dir, "orders")
      .write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(out)
    spark.read.parquet(out)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), sumDec2($"o_totalprice").as("sum_price"))
      .orderBy($"o_orderstatus".asc_nulls_first)
  }

  val q05Sql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus NULLS FIRST""".stripMargin

  /** Q88 — ORC sink + scan round-trip: the third columnar format of the
    * connector matrix (parquet Q01/Q04, CSV Q02, JSON Q03). ORC reads get
    * the same DataSource-V2 treatment as parquet — column pruning and
    * predicate pushdown reach the stripe reader — so the choice of format
    * is a layout decision, not a capability loss. The oracle reads the
    * original parquet: the round-trip must be value-preserving.
    */
  def q88(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = scratch("q88_supplier_orc")
    t(spark, dir, "supplier")
      .write.mode(SaveMode.Overwrite).orc(out)
    spark.read.orc(out)
      .filter($"s_suppkey" % 2 === 0)
      .groupBy($"s_nationkey")
      .agg(count(lit(1)).as("n"), sumDec2($"s_acctbal").as("sum_bal"))
      .orderBy($"s_nationkey".asc_nulls_first)
  }

  val q88Sql: String =
    """SELECT s_nationkey, COUNT(*) AS n,
      | CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM supplier WHERE s_suppkey % 2 = 0
      |GROUP BY s_nationkey ORDER BY s_nationkey NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_parquet_scan" -> (q01 _),
    "q02_csv_roundtrip" -> (q02 _),
    "q03_json_roundtrip" -> (q03 _),
    "q04_parquet_sink" -> (q04 _),
    "q05_partitioned_sink" -> (q05 _),
    "q88_orc_roundtrip" -> (q88 _))

  def oracles: Map[String, String] = Map(
    "q01_parquet_scan" -> q01Sql,
    "q02_csv_roundtrip" -> q02Sql,
    "q03_json_roundtrip" -> q03Sql,
    "q04_parquet_sink" -> q04Sql,
    "q05_partitioned_sink" -> q05Sql,
    "q88_orc_roundtrip" -> q88Sql)
}
