package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.Similarity

/** Round-6 batch 2 (q110–q114): embedding centroid features, CUBE
  * aggregation, time-series gap-fill + OHLC resampling, and snapshot
  * diffing — the analytics shapes a curation/lakehouse pipeline runs on
  * top of the relational core. All oracle-gated against DuckDB.
  */
object AnalyticsOps {

  /** Q110 — PER-LABEL CENTROID FEATURES: exact-decimal per-dimension
    * mean embedding per label (the k-means recompute shape, labels as
    * cells), then for every vector its cosine to its OWN label centroid,
    * the best cosine to any OTHER centroid, and the margin — the
    * standard label-consistency / outlier score a curation pipeline uses
    * to find mislabeled or off-distribution points. Centroids are a
    * k-row broadcast; one pass over the corpus scores everything.
    */
  def q110(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = t(spark, dir, "embeddings")
      .select($"vec_id", $"label".cast(LongType).as("label"),
        transform($"embedding", x => x.cast(DoubleType)).as("v"))
      .filter(Similarity.norm($"v") > 0.0)
    val expl = t(spark, dir, "embeddings")
      .select($"label".cast(LongType).as("label"),
        posexplode(transform($"embedding", x => x.cast(DoubleType)))
          .as(Seq("pos", "ev")))
    val centd = expl.groupBy($"label", $"pos")
      .agg((sum($"ev".cast(DecimalType(28, 10))).cast(DoubleType)
        / count(lit(1))).as("cv"))
    val cent = centd.groupBy($"label")
      .agg(transform(sort_array(collect_list(struct($"pos", $"cv"))),
        s => s.getField("cv")).as("centroid"))
      .select($"label".as("clabel"), $"centroid")
      .filter(Similarity.norm($"centroid") > 0.0)
    val scored = v.join(broadcast(cent))
      .withColumn("cos6", round(
        Similarity.dot($"v", $"centroid")
          / (Similarity.norm($"v") * Similarity.norm($"centroid")), 6))
    val own = scored.filter($"label" === $"clabel")
      .select($"vec_id", $"label", $"cos6".as("cos_own6"))
    val oth = scored.filter($"label" =!= $"clabel")
      .groupBy($"vec_id").agg(max($"cos6").as("best_other6"))
    own.join(oth, Seq("vec_id"))
      .select($"vec_id", $"label", $"cos_own6", $"best_other6",
        round($"cos_own6" - $"best_other6", 6).as("margin6"))
      .orderBy($"vec_id".asc_nulls_first)
  }

  val q110Sql: String =
    """WITH v AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      |  FROM embeddings
      |  WHERE SQRT(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |                              list_transform(embedding, x -> CAST(x AS DOUBLE)))) > 0),
      |expl AS (
      |  SELECT CAST(label AS BIGINT) AS label, generate_subscripts(embedding, 1) AS pos,
      |    CAST(unnest(embedding) AS DOUBLE) AS ev
      |  FROM embeddings),
      |centd AS (
      |  SELECT label, pos,
      |    CAST(SUM(CAST(ev AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS cv
      |  FROM expl GROUP BY label, pos),
      |cent AS (
      |  SELECT label AS clabel, list(cv ORDER BY pos) AS centroid
      |  FROM centd GROUP BY label),
      |centf AS (
      |  SELECT clabel, centroid FROM cent
      |  WHERE SQRT(list_dot_product(centroid, centroid)) > 0),
      |scored AS (
      |  SELECT a.vec_id, a.label, c.clabel,
      |    ROUND(list_dot_product(a.v, c.centroid)
      |      / (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(c.centroid, c.centroid))), 6) AS cos6
      |  FROM v a CROSS JOIN centf c),
      |own AS (SELECT vec_id, label, cos6 AS cos_own6 FROM scored WHERE label = clabel),
      |oth AS (SELECT vec_id, MAX(cos6) AS best_other6 FROM scored WHERE label <> clabel GROUP BY vec_id)
      |SELECT o.vec_id, o.label, o.cos_own6, t.best_other6,
      |  ROUND(o.cos_own6 - t.best_other6, 6) AS margin6
      |FROM own o JOIN oth t ON t.vec_id = o.vec_id
      |ORDER BY o.vec_id NULLS FIRST""".stripMargin

  /** Q111 — CUBE aggregation: all 2^k grouping combinations of
    * (returnflag, linestatus) with the grouping_id disambiguating
    * subtotal levels — rounds out q24's ROLLUP/GROUPING SETS so the
    * whole grouping-analytics matrix is covered. One Expand + one
    * hash-agg; decimal-exact money sums surfaced as DOUBLE.
    */
  def q111(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "lineitem")
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sumDec2($"l_quantity").as("sum_qty"),
        sumDec2($"l_extendedprice").as("sum_price"),
        count(lit(1)).as("n"), grouping_id().as("gid"))
      .orderBy($"gid".asc_nulls_first, $"l_returnflag".asc_nulls_first,
        $"l_linestatus".asc_nulls_first)
  }

  val q111Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
      |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY gid NULLS FIRST, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Q112 — TIME-SERIES GAP FILL: materialise the complete 5-minute
    * bucket grid per event_type over the stream's global span
    * (`sequence` + explode — no driver loop), left-join the observed
    * buckets, zero-fill counts and forward-fill the last observed
    * per-bucket max value with an IGNORE NULLS window — the resampling
    * primitive every monitoring/feature pipeline needs. The grid is
    * types × span/300 rows, generated distributed; the ffill window
    * partitions by type and streams.
    */
  def q112(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = (unix_timestamp($"ts") / 300L).cast(LongType) * 300L
    val b = t(spark, dir, "events")
      .groupBy($"event_type", bucket.as("bucket"))
      .agg(count(lit(1)).as("n"), max($"value").as("vmax"))
    val range = b.agg(min($"bucket").as("lo"), max($"bucket").as("hi"))
    val types = t(spark, dir, "events").select($"event_type").distinct()
    val grid = types.crossJoin(broadcast(range))
      .select($"event_type", explode(sequence($"lo", $"hi", lit(300L))).as("bucket"))
    val w = Window.partitionBy($"event_type").orderBy($"bucket".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(b, Seq("event_type", "bucket"), "left")
      .select($"event_type", $"bucket", coalesce($"n", lit(0L)).as("n"), $"vmax")
      .withColumn("vfill6", round(last($"vmax", ignoreNulls = true).over(w), 6))
      .drop("vmax")
      .orderBy($"event_type".asc_nulls_first, $"bucket".asc_nulls_first)
  }

  val q112Sql: String =
    """WITH b AS (
      |  SELECT event_type, (epoch_us(CAST(ts AS TIMESTAMP)) // 300000000) * 300 AS bucket,
      |    COUNT(*) AS n, MAX(value) AS vmax
      |  FROM events GROUP BY 1, 2),
      |r AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
      |types AS (SELECT DISTINCT event_type FROM events),
      |grid AS (SELECT t.event_type, g.g AS bucket
      |         FROM types t, r, UNNEST(generate_series(r.lo, r.hi, 300)) AS g(g)),
      |j AS (SELECT g.event_type, g.bucket, COALESCE(b.n, 0) AS n, b.vmax
      |      FROM grid g LEFT JOIN b ON b.event_type = g.event_type AND b.bucket = g.bucket)
      |SELECT event_type, bucket, n,
      |  ROUND(LAST_VALUE(vmax IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY bucket
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS vfill6
      |FROM j ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin

  /** Q113 — OHLC RESAMPLING: open/high/low/close of `value` per
    * (event_type, 15-minute bucket) — the financial-style downsample.
    * Open/close anchor on the event_id sequence (min_by/max_by, unique →
    * deterministic in any engine and under any partitioning); one
    * partial+final hash-agg, no window, no sort until the final
    * presentation ORDER BY.
    */
  def q113(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bucket = (unix_timestamp($"ts") / 900L).cast(LongType) * 900L
    // value IS NOT NULL on BOTH sides: Spark's min_by returns the value at
    // the extremal key even when NULL, DuckDB's arg_min skips NULLs — the
    // explicit filter pins one contract for any future fixture with nulls
    t(spark, dir, "events")
      .filter($"value".isNotNull)
      .groupBy($"event_type", bucket.as("bucket"))
      .agg(min_by($"value", $"event_id").as("open"),
        max($"value").as("high"), min($"value").as("low"),
        max_by($"value", $"event_id").as("close"),
        count(lit(1)).as("n"))
      .orderBy($"event_type".asc_nulls_first, $"bucket".asc_nulls_first)
  }

  val q113Sql: String =
    """SELECT event_type, (epoch_us(CAST(ts AS TIMESTAMP)) // 900000000) * 900 AS bucket,
      |  arg_min(value, event_id) AS open, MAX(value) AS high, MIN(value) AS low,
      |  arg_max(value, event_id) AS close, COUNT(*) AS n
      |FROM events WHERE value IS NOT NULL GROUP BY 1, 2
      |ORDER BY event_type NULLS FIRST, bucket NULLS FIRST""".stripMargin

  /** Q114 — SNAPSHOT DIFF: classify every key across two table versions
    * (the base `orders` vs the q103 CDC-merged result) as added /
    * removed / changed / unchanged, with row counts and the exact-decimal
    * net value delta per class — the audit report a pipeline publishes
    * after every merge window. One full-outer join, one 4-row aggregate;
    * composes directly on q103's output frame.
    */
  def q114(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val base = t(spark, dir, "orders")
      .select($"o_orderkey".as("bk"), $"o_totalprice".cast(DoubleType).as("bt"))
    val next = PipelineOps.q103Merged(spark, dir)
      .select($"o_orderkey".as("nk"), $"total".as("nt"))
    base.join(next, $"bk" === $"nk", "full_outer")
      .select(
        when($"bk".isNull, "added")
          .when($"nk".isNull, "removed")
          .when($"nt" =!= $"bt", "changed")
          .otherwise("unchanged").as("change_class"),
        (dec2(coalesce($"nt", lit(0.0))) - dec2(coalesce($"bt", lit(0.0)))).as("d"))
      .groupBy($"change_class")
      .agg(count(lit(1)).as("n"), sum($"d").cast(DoubleType).as("delta2"))
      .orderBy($"change_class".asc_nulls_first)
  }

  val q114Sql: String =
    """WITH ch AS (
      |  SELECT o_orderkey AS k, 'U' AS op,
      |    CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)) * 1.1, 2) AS DOUBLE) AS nt
      |  FROM orders WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, 'D', CAST(NULL AS DOUBLE) FROM orders WHERE o_orderkey % 10 = 1
      |  UNION ALL
      |  SELECT -o_orderkey, 'I', CAST(o_totalprice AS DOUBLE)
      |  FROM orders WHERE o_orderkey % 100 = 2),
      |m AS (
      |  SELECT COALESCE(b.o_orderkey, c.k) AS o_orderkey,
      |    CASE WHEN c.op IN ('U','I') THEN c.nt ELSE CAST(b.o_totalprice AS DOUBLE) END AS total
      |  FROM orders b FULL JOIN ch c ON c.k = b.o_orderkey
      |  WHERE c.op IS NULL OR c.op <> 'D'),
      |d AS (
      |  SELECT CASE WHEN b.o_orderkey IS NULL THEN 'added'
      |              WHEN m.o_orderkey IS NULL THEN 'removed'
      |              WHEN m.total <> CAST(b.o_totalprice AS DOUBLE) THEN 'changed'
      |              ELSE 'unchanged' END AS change_class,
      |    CAST(COALESCE(m.total, 0.0) AS DECIMAL(18,2))
      |      - CAST(COALESCE(CAST(b.o_totalprice AS DOUBLE), 0.0) AS DECIMAL(18,2)) AS d
      |  FROM orders b FULL JOIN m ON m.o_orderkey = b.o_orderkey)
      |SELECT change_class, COUNT(*) AS n, CAST(SUM(d) AS DOUBLE) AS delta2
      |FROM d GROUP BY change_class ORDER BY change_class NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_centroid_features" -> (q110 _),
    "q111_cube" -> (q111 _),
    "q112_gap_fill" -> (q112 _),
    "q113_ohlc_resample" -> (q113 _),
    "q114_snapshot_diff" -> (q114 _))

  def oracles: Map[String, String] = Map(
    "q110_centroid_features" -> q110Sql,
    "q111_cube" -> q111Sql,
    "q112_gap_fill" -> q112Sql,
    "q113_ohlc_resample" -> q113Sql,
    "q114_snapshot_diff" -> q114Sql)
}
