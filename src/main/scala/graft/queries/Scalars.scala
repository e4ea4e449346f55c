package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._

/** SURVEY.md §2B.8 — scalar function families (Q39–Q45).
  *
  * Everything here is a codegen'd built-in (`org.apache.spark.sql.
  * functions`) — no UDFs — so the whole projection stays inside one
  * WholeStageCodegen span over the scan.
  */
object Scalars {

  /** Q39 — string functions: concat, substring, upper/lower, trim, lpad,
    * split, regexp_extract, regexp_replace, length, instr.
    */
  def q39(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "part")
      .select($"p_partkey",
        concat($"p_brand", lit("_"), split($"p_name", " ").getItem(0)).as("brand_tok"),
        upper($"p_name").as("up"),
        lower($"p_type").as("lo"),
        substring($"p_name", 1, 5).as("sub5"),
        trim(lpad($"p_name", 20, "*")).as("padded"),
        regexp_extract($"p_name", "([a-z]+)$", 1).as("last_word"),
        regexp_replace($"p_name", "[aeiou]", "").as("no_vowels"),
        length($"p_name").as("len"),
        instr($"p_name", "a").as("pos_a"))
      .orderBy($"p_partkey".asc_nulls_first)
      .limit(300)
  }

  val q39Sql: String =
    """SELECT p_partkey,
      | p_brand || '_' || string_split(p_name, ' ')[1] AS brand_tok,
      | UPPER(p_name) AS up, LOWER(p_type) AS lo,
      | substring(p_name, 1, 5) AS sub5,
      | TRIM(lpad(p_name, 20, '*')) AS padded,
      | COALESCE(regexp_extract(p_name, '([a-z]+)$', 1), '') AS last_word,
      | regexp_replace(p_name, '[aeiou]', '', 'g') AS no_vowels,
      | LENGTH(p_name) AS len, instr(p_name, 'a') AS pos_a
      |FROM part ORDER BY p_partkey NULLS FIRST LIMIT 300""".stripMargin

  /** Q40 — date/time functions: year, month, day, date_trunc, date_add,
    * datediff, to_date, unix_timestamp, make_date (dates surfaced as
    * strings to dodge date-object representation differences).
    */
  def q40(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "orders")
      .filter($"o_orderkey" < 1000)
      .select($"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("d"),
        date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("month_start"),
        date_format(date_add(to_date($"o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(to_date($"o_orderdate"), to_date(lit("1995-01-01"))).as("days_since"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        date_format(make_date(year($"o_orderdate"), lit(1), lit(1)), "yyyy-MM-dd").as("year_start"))
      .orderBy($"o_orderkey".asc_nulls_first)
  }

  val q40Sql: String =
    """SELECT o_orderkey,
      | EXTRACT(year FROM o_orderdate) AS y,
      | EXTRACT(month FROM o_orderdate) AS m,
      | EXTRACT(day FROM o_orderdate) AS d,
      | strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      | strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
      | date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
      | CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
      | strftime(make_date(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER), 1, 1), '%Y-%m-%d') AS year_start
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey NULLS FIRST""".stripMargin

  /** Q41 — math functions: round/floor/ceil/abs on exact decimals;
    * pow/sqrt/ln/exp on doubles rounded at the edge; pmod, sign.
    */
  def q41(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val priceDec = dec2($"p_retailprice")
    t(spark, dir, "part")
      .select($"p_partkey",
        round(priceDec * lit(new java.math.BigDecimal("1.1")), 2)
          .cast(DoubleType).as("marked_up"),
        floor(priceDec).cast(LongType).as("fl"),
        ceil(priceDec).cast(LongType).as("ce"),
        abs(priceDec - lit(1000)).cast(DoubleType).as("dist1000"),
        round(pow($"p_size", 2.0), 6).as("size_sq"),
        round(sqrt($"p_retailprice"), 6).as("sq"),
        round(log($"p_retailprice"), 6).as("ln_p"),
        round(exp($"p_size" / lit(100.0)), 6).as("exp_s"),
        pmod($"p_partkey", lit(7)).as("pm"),
        signum($"p_retailprice" - lit(1000.0)).cast(IntegerType).as("sgn"))
      .orderBy($"p_partkey".asc_nulls_first)
      .limit(300)
  }

  val q41Sql: String =
    """SELECT p_partkey,
      | CAST(ROUND(CAST(p_retailprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE) AS marked_up,
      | CAST(FLOOR(CAST(p_retailprice AS DECIMAL(18,2))) AS BIGINT) AS fl,
      | CAST(CEIL(CAST(p_retailprice AS DECIMAL(18,2))) AS BIGINT) AS ce,
      | CAST(ABS(CAST(p_retailprice AS DECIMAL(18,2)) - 1000) AS DOUBLE) AS dist1000,
      | ROUND(POW(p_size, 2.0), 6) AS size_sq,
      | ROUND(SQRT(p_retailprice), 6) AS sq,
      | ROUND(LN(p_retailprice), 6) AS ln_p,
      | ROUND(EXP(p_size / 100.0), 6) AS exp_s,
      | ((p_partkey % 7) + 7) % 7 AS pm,
      | CAST(SIGN(p_retailprice - 1000.0) AS INTEGER) AS sgn
      |FROM part ORDER BY p_partkey NULLS FIRST LIMIT 300""".stripMargin

  /** Q42 — array functions + higher-order functions over `embedding`
    * (array<float>): size, slice, fold (aggregate), filter, array_max.
    * The fold runs left-to-right in both engines → bit-identical doubles.
    */
  def q42(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "embeddings")
      .select($"vec_id",
        size($"embedding").as("dim"),
        aggregate(slice(transform($"embedding", x => x.cast(DoubleType)), 1, 8),
          lit(0.0), (acc, x) => acc + x).as("s8"),
        array_max(transform($"embedding", x => x.cast(DoubleType))).as("mx"),
        size(filter($"embedding", x => x > 0f)).as("n_pos"),
        array_contains(transform($"embedding", x => x > 0.5f), true).as("has_big"))
      .orderBy($"vec_id".asc_nulls_first)
      .limit(300)
  }

  val q42Sql: String =
    """SELECT vec_id, len(embedding) AS dim,
      | list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum') AS s8,
      | list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'max') AS mx,
      | len(list_filter(embedding, x -> x > 0)) AS n_pos,
      | list_contains(list_transform(embedding, x -> x > 0.5), true) AS has_big
      |FROM embeddings ORDER BY vec_id NULLS FIRST LIMIT 300""".stripMargin

  /** Q43 — map functions: from_json to MapType, element_at, map_keys,
    * explode of the map to (key, value) rows.
    */
  def q43(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val m = from_json($"props", MapType(StringType, IntegerType))
    t(spark, dir, "events")
      .filter($"event_id" < 300)
      .select($"event_id", explode(m).as(Seq("k", "v")))
      .withColumn("n_keys", lit(1))
      .orderBy($"event_id".asc_nulls_first, $"k".asc_nulls_first)
  }

  val q43Sql: String =
    """SELECT event_id, 'k' AS k, CAST(json_extract(props, '$.k') AS INTEGER) AS v, 1 AS n_keys
      |FROM events WHERE event_id < 300
      |ORDER BY event_id NULLS FIRST, k NULLS FIRST""".stripMargin

  /** Q44 — JSON functions: get_json_object, from_json struct, json path. */
  def q44(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val parsed = from_json($"props", StructType(Seq(StructField("k", IntegerType))))
    t(spark, dir, "events")
      .select($"event_id",
        get_json_object($"props", "$.k").as("k_str"),
        parsed.getField("k").as("k_int"))
      .filter($"event_id" < 300)
      .orderBy($"event_id".asc_nulls_first)
  }

  val q44Sql: String =
    """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
      | CAST(json_extract(props, '$.k') AS INTEGER) AS k_int
      |FROM events WHERE event_id < 300 ORDER BY event_id NULLS FIRST""".stripMargin

  /** Q45 — hash functions: md5 + sha2-256 of concatenated key columns (the
    * reference's own workload is md5 mining — examples/example_etl.py:
    * 104-127). crc32/xxhash64 have no DuckDB analogue → covered in the
    * ScalaTest spec instead.
    */
  def q45(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey",
        md5(concat($"n_name", lit("|"), $"r_name")).as("h_md5"),
        sha2(concat($"n_name", lit("|"), $"r_name"), 256).as("h_sha256"))
      .orderBy($"n_nationkey".asc_nulls_first)
  }

  val q45Sql: String =
    """SELECT n_nationkey, md5(n_name || '|' || r_name) AS h_md5,
      | sha256(n_name || '|' || r_name) AS h_sha256
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |ORDER BY n_nationkey NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q39_string_funcs" -> (q39 _),
    "q40_datetime_funcs" -> (q40 _),
    "q41_math_funcs" -> (q41 _),
    "q42_array_funcs" -> (q42 _),
    "q43_map_funcs" -> (q43 _),
    "q44_json_funcs" -> (q44 _),
    "q45_hash_funcs" -> (q45 _))

  def oracles: Map[String, String] = Map(
    "q39_string_funcs" -> q39Sql,
    "q40_datetime_funcs" -> q40Sql,
    "q41_math_funcs" -> q41Sql,
    "q42_array_funcs" -> q42Sql,
    "q43_map_funcs" -> q43Sql,
    "q44_json_funcs" -> q44Sql,
    "q45_hash_funcs" -> q45Sql)
}
