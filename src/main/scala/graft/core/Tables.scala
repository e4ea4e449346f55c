package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table access + canonicalisation helpers shared by every query.
  *
  * Determinism contract (SURVEY.md §7.4): aggregates over money columns are
  * computed in exact DECIMAL arithmetic (bit-identical between Spark and the
  * DuckDB oracle) and only cast to DOUBLE at the end; every query output is
  * totally ordered with explicit NULLS FIRST so row order agrees with the
  * oracle's ORDER BY ... NULLS FIRST.
  */
object Tables {

  /** Load one of the driver-generated parquet tables (TESTDATA.md).
    *
    * `events.ts` is INT64 TIMESTAMP(NANOS), which Spark 4 refuses to map to
    * its µs TimestampType. We read nanos as a plain long
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to µs — exactly
    * what DuckDB's TIMESTAMP_NS→TIMESTAMP cast does, so oracle SQL can use
    * plain `CAST(ts AS TIMESTAMP)` semantics.
    *
    * The table schema is inferred once per (dir, table) and cached — the
    * catalog-metadata pattern: immutable ingested data never needs its
    * parquet footers re-read for every query that scans it.
    */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.schema(cachedSchema(spark, dir, name))
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.schema(cachedSchema(spark, dir, name))
        .parquet(s"$dir/$name.parquet")
    }

  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()

  private def cachedSchema(spark: SparkSession, dir: String,
                           name: String): StructType = {
    // the cache key carries the file's (mtime, size): rewritten data at
    // the same path re-infers instead of silently reading NULLs for
    // renamed columns through a stale explicit schema
    val f = new java.io.File(s"$dir/$name.parquet")
    val key = s"$dir/$name@${f.lastModified}:${f.length}"
    schemaCache.computeIfAbsent(key, _ => {
      if (name == "events") // nanos column must surface as long pre-cache too
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet").schema
    })
  }

  /** Money/quantity column → exact decimal(18,2); mirrors
    * CAST(x AS DECIMAL(18,2)) in the oracle SQL. Input doubles carry 2
    * decimals, so this is a lossless recovery in both engines.
    */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Finely-scaled decimal for intermediate products (keeps later
    * multiplications inside decimal(38,_) exactly, no precision loss).
    */
  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Exact decimal sum surfaced as double: identical in Spark and DuckDB
    * because the decimal sum is exact and double conversion is
    * round-to-nearest in both.
    */
  def sumDec2(c: Column): Column = sum(dec2(c)).cast(DoubleType)

  /** Deterministic total order, Spark side: ascending, NULLS FIRST on every
    * key (oracle SQL must say ORDER BY k1 NULLS FIRST, ...).
    */
  def ordered(df: DataFrame, keys: String*): DataFrame =
    df.orderBy(keys.map(k => col(k).asc_nulls_first): _*)
}
