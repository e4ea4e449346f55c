package graft

import org.apache.spark.sql.types._

/** One-stop assertion of every schema assumption the engine makes about
  * the driver-generated fixtures (TESTDATA.md). The driver regenerates
  * these between rounds and has changed physical types before (round 9:
  * events.ts flipped TIMESTAMP(NANOS)→µs, breaking 13 tests across 8
  * suites at analysis time). This spec exists so the NEXT flip fails
  * here first, with a message naming the drifted column — not as a
  * scatter of analysis errors deep inside unrelated suites.
  *
  * Types listed are the ones the engine's ingest NORMALIZES TO (post
  * `Tables.t`), not raw parquet physical types — `events.ts` is accepted
  * as either ns-int64 or µs and must always surface as TimestampType.
  */
class FixtureContractSpec extends SparkSpec {

  private val expected: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  // Date-like columns the engine treats as orderable event time; they have
  // shipped as µs timestamps but date arithmetic only needs a temporal
  // type, so accept either flavor and flag anything else.
  private val temporal: Map[String, Set[String]] = Map(
    "orders" -> Set("o_orderdate"), "lineitem" -> Set("l_shipdate"))

  for (table <- expected.keys.toSeq.sorted)
    test(s"fixture contract: $table") {
      val df = graft.core.Tables.t(spark, sfDir, table)
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      val drifted = expected(table).collect {
        case (col, want) if !actual.contains(col) => s"$col: MISSING"
        case (col, want) if actual(col) != want =>
          s"$col: ${actual(col)} (engine assumes $want)"
      }
      assert(drifted.isEmpty,
        s"fixture '$table' drifted from the engine's assumptions — " +
          s"update ingest normalization (core/Tables.scala) or the " +
          s"affected queries: ${drifted.mkString("; ")}")
      val missingTemporal = temporal.getOrElse(table, Set.empty).collect {
        case c if !actual.get(c).exists(t =>
          t == TimestampType || t == TimestampNTZType || t == DateType) =>
          s"$c: ${actual.get(c).map(_.toString).getOrElse("MISSING")}"
      }
      assert(missingTemporal.isEmpty,
        s"fixture '$table' temporal columns drifted: " +
          missingTemporal.mkString("; "))
    }
}
