package graft.connect

import org.apache.spark.sql.{DataFrame, DataFrameReader, DataFrameWriter, Row, SparkSession}
import graft.core.EngineContext

/** Engine-URL connector layer — the analogue of ayeaye `Connect`'s
  * `engine_url` strings (reference examples/example_etl.py:56-61,139-143:
  * `csv://{output_datasets}/staggered_results.csv`). The scheme prefix
  * selects the DataSource format; `{var}` templates resolve against the
  * job's [[graft.core.EngineContext]]; query params become reader/writer
  * options.
  *
  * Formats: csv (header on by default, like the reference's header'd
  * CSVs), jsonl (Spark json = JSON-lines), parquet; any OTHER scheme
  * forwards verbatim to Spark's DataSource registry (ExecLayerSpec
  * round-trips orc — a registry format the scheme table never names,
  * options included — and proves an unknown scheme surfaces the
  * registry's own lookup error).
  */
object EngineUrl {

  final case class Parsed(format: String, path: String, options: Map[String, String])

  def parse(url: String, ctx: EngineContext): Parsed = {
    val resolved = ctx.resolve(url)
    val schemeSplit = resolved.split("://", 2)
    require(schemeSplit.length == 2, s"engine url needs a scheme: '$url'")
    val (scheme, rest) = (schemeSplit(0), schemeSplit(1))
    val (path, query) = rest.split("\\?", 2) match {
      case Array(p, q) => (p, q)
      case Array(p) => (p, "")
    }
    val opts = query.split("&").filter(_.nonEmpty).map { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap
    val (format, defaults) = scheme match {
      case "csv" => ("csv", Map("header" -> "true"))
      case "jsonl" | "json" => ("json", Map.empty[String, String])
      case "parquet" => ("parquet", Map.empty[String, String])
      case other => (other, Map.empty[String, String]) // any DataSource name
    }
    Parsed(format, path, defaults ++ opts)
  }

  /** Open an engine URL for reading. */
  def read(spark: SparkSession, url: String, ctx: EngineContext): DataFrame = {
    val p = parse(url, ctx)
    val reader: DataFrameReader = spark.read.format(p.format).options(p.options)
    reader.load(p.path)
  }

  /** Write a frame to an engine URL (overwrite, the reference's
    * access=WRITE semantics). `partitionBy` gives the templated
    * one-dataset-per-key shape (example_etl.py:56-61) in a single
    * distributed write.
    */
  def write(df: DataFrame, url: String, ctx: EngineContext,
            mode: String = "overwrite", partitionBy: Seq[String] = Nil): Unit = {
    val p = parse(url, ctx)
    val w: DataFrameWriter[Row] = df.write.format(p.format).options(p.options).mode(mode)
    val w2 = if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w
    w2.save(p.path)
  }
}
