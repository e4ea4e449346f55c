package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables._
import graft.ops.TextOps

/** Round-9 corpus-export additions (q133–q136): the last mile of a
  * training-data pipeline — per-source quota capping (web-corpus domain
  * caps), document chunking for retrieval windows, pre-aggregated
  * mergeable NDV sketches (the daily-shard rollup pattern), and the
  * deterministic shard export a trainer actually reads. All map-side or
  * single-shuffle shapes; oracle-gated against DuckDB except the sketch
  * rollup (q23 pattern: sketches have no SQL-portable oracle — the spec
  * bounds them against the exact twin instead).
  */
object ExportOps {

  /** Q133 — PER-SOURCE QUOTA CAP (domain capping): keep at most
    * [[SourceCap]] documents per `source`, selected by deterministic
    * md5(doc_id) priority — the Common-Crawl-style guard against any
    * single host dominating the mix. Hash priority (not "first K by id")
    * makes the kept subset an unbiased, reproducible sample of each
    * source, on any engine and any partitioning.
    *
    * Scale shape: ONE hash shuffle on `source`; the rank ≤ K predicate
    * plans as WindowGroupLimit (q32's pushdown — asserted in
    * ExportOpsSpec), so each partition keeps a K-row heap per source
    * instead of fully sorting its groups.
    */
  val SourceCap = 10

  def q133(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pri = TextOps.hash32($"doc_id".cast(StringType))
    val w = Window.partitionBy($"source").orderBy(pri.asc, $"doc_id".asc)
    t(spark, dir, "documents")
      .select($"doc_id", $"source", $"n_chars")
      .withColumn("keep_rank", row_number().over(w))
      .filter($"keep_rank" <= SourceCap)
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q133Sql: String =
    s"""SELECT doc_id, source, n_chars, keep_rank FROM (
       |  SELECT doc_id, source, n_chars,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |               doc_id) AS keep_rank
       |  FROM documents)
       |WHERE keep_rank <= $SourceCap
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  /** Q143 — TEMPERATURE-WEIGHTED TOKEN-BUDGET MIXTURE CAP: the step
    * after q133's per-source count cap in a real pretraining mix — fix a
    * global character budget (half the corpus, [[MixtureBudgetDiv]]) and
    * split it across sources by a TEMPERED share: weight w_s =
    * ⌊√(chars_s)⌋, the classic τ=0.5 mixture temperature that upweights
    * small sources relative to proportional sampling without letting any
    * giant source keep its raw share. Each source then keeps documents in
    * md5(doc_id) priority order until its character budget is exhausted
    * (running total ≤ budget — a doc that would cross the line is
    * dropped, as is every doc behind it in priority order).
    *
    * Every step is integer-exact cross-engine: ⌊√x⌋ of a BIGINT is
    * deterministic (IEEE-correctly-rounded sqrt, then floor), and the
    * budget split is exact multiply + integer division — no doubles
    * survive into the keep rule. The `budget × w` product is computed in
    * DECIMAL(38,0): at the query's own design scale (100 TB ≈ 1e14
    * chars, w ≈ 1e7) the BIGINT product would overflow, and with
    * ansi=false Spark would WRAP silently where the DuckDB oracle
    * raises — decimal keeps the Spark side exact (~1e21 ≪ 1e38) and the
    * final per-source budget is provably ≤ corpus_chars, so the result
    * narrows back to BIGINT losslessly.
    *
    * Scale shape: the mass/weight table is one partial-agg pass (rows =
    * #sources, broadcast back); the keep rule is ONE hash shuffle on
    * `source` with a running-sum window — same single-shuffle shape as
    * q133, just with a char-budget cutoff instead of a row count.
    */
  val MixtureBudgetDiv = 2

  def q143(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = t(spark, dir, "documents").select($"doc_id", $"source", $"n_chars")
    // ONE aggregation pass computes the whole budget table: the corpus
    // totals come from an unpartitioned window over the #sources-row agg
    // frame (driver-size BY DESIGN — a second scan of the raw table just
    // to re-sum #sources rows would be the actual scale mistake)
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val budgets = docs.groupBy($"source").agg(sum($"n_chars").as("chars_total"))
      .withColumn("w", floor(sqrt($"chars_total".cast(DoubleType))).cast(LongType))
      .withColumn("corpus_chars", sum($"chars_total").over(all))
      .withColumn("w_total", sum($"w").over(all))
      .select($"source",
        expr(s"CAST((CAST(corpus_chars div $MixtureBudgetDiv AS DECIMAL(38,0))" +
            s" * w) div w_total AS BIGINT)")
          .as("budget_chars"))
    val win = Window.partitionBy($"source")
      .orderBy(TextOps.hash32($"doc_id".cast(StringType)).asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum_chars", sum($"n_chars").over(win))
      .join(broadcast(budgets), Seq("source"))
      .filter($"cum_chars" <= $"budget_chars")
      .select($"doc_id", $"source", $"n_chars", $"cum_chars", $"budget_chars")
      .orderBy($"doc_id".asc_nulls_first)
  }

  val q143Sql: String =
    s"""WITH mass AS (
       |  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars_total,
       |    CAST(FLOOR(SQRT(CAST(SUM(n_chars) AS DOUBLE))) AS BIGINT) AS w
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(SUM(chars_total) AS BIGINT) AS corpus_chars,
       |               CAST(SUM(w) AS BIGINT) AS w_total FROM mass),
       |bud AS (
       |  SELECT m.source,
       |    CAST(((t.corpus_chars // $MixtureBudgetDiv) * m.w) // t.w_total AS BIGINT) AS budget_chars
       |  FROM mass m CROSS JOIN tot t),
       |cum AS (
       |  SELECT doc_id, source, n_chars,
       |    CAST(SUM(n_chars) OVER (PARTITION BY source
       |      ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |               doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_chars
       |  FROM documents)
       |SELECT c.doc_id, c.source, c.n_chars, c.cum_chars, b.budget_chars
       |FROM cum c JOIN bud b ON c.source = b.source
       |WHERE c.cum_chars <= b.budget_chars
       |ORDER BY c.doc_id NULLS FIRST""".stripMargin

  /** Q134 — DOCUMENT CHUNKING (the retrieval/RAG prep shape): split
    * every document into overlapping character windows of
    * [[ChunkChars]] chars at [[ChunkStride]] stride, carrying the chunk
    * ordinal and byte offset so a retriever can map hits back into the
    * source document. Emitted as (doc_id, chunk_id, chunk_start,
    * n_chunk_chars, chunk_md5) — the hash stands in for shipping the
    * text twice through the compare harness.
    *
    * Scale shape: map-only — `explode(sequence(...))` fans out inside
    * the scan stage with no shuffle at all (ExportOpsSpec pins the
    * plan); at 100 TB this is the embarrassingly-parallel step before
    * embedding, and partition width is controlled by the input splits.
    */
  val ChunkChars = 200
  val ChunkStride = 150

  /** The q134 chunking rule over an explicit document frame — the RAG
    * lifecycle model (q168) runs it over the DEDUPED corpus.
    */
  private[queries] def chunkDocs(docs: DataFrame): DataFrame =
    docs
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), (col("n_chars") - 1).cast(IntegerType),
          lit(ChunkStride))).as("chunk_start"))
      .select(col("doc_id"),
        (col("chunk_start") / ChunkStride).cast(LongType).as("chunk_id"),
        col("chunk_start").cast(LongType).as("chunk_start"),
        substring(col("text"), col("chunk_start") + 1, lit(ChunkChars))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_id"), col("chunk_start"),
        length(col("chunk")).cast(LongType).as("n_chunk_chars"),
        md5(col("chunk")).as("chunk_md5"))

  def q134(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    chunkDocs(t(spark, dir, "documents"))
      .orderBy($"doc_id".asc_nulls_first, $"chunk_id".asc_nulls_first)
  }

  val q134Sql: String =
    s"""SELECT doc_id, s // $ChunkStride AS chunk_id, s AS chunk_start,
       |  CAST(length(substr(text, CAST(s + 1 AS INT), $ChunkChars)) AS BIGINT) AS n_chunk_chars,
       |  md5(substr(text, CAST(s + 1 AS INT), $ChunkChars)) AS chunk_md5
       |FROM documents, UNNEST(range(0, CAST(n_chars AS BIGINT), $ChunkStride)) AS g(s)
       |WHERE n_chars > 0
       |ORDER BY doc_id NULLS FIRST, chunk_id NULLS FIRST""".stripMargin

  /** Q135 — PRE-AGGREGATED NDV SKETCH ROLLUP: the two-stage pattern
    * every 100 TB metrics pipeline runs. Stage 1 builds one mergeable
    * Datasketches HLL sketch of `user_id` per (event_type, day) and
    * PERSISTS the binary sketches to parquet — at scale those are the
    * tiny per-day artifacts a daily job ships. Stage 2 reads the
    * sketch table back and `hll_union`-merges across days per
    * event_type for a rolling distinct-user count, never rescanning
    * the raw events.
    *
    * Register-max union is associative/commutative, so the merged
    * estimate is IDENTICAL to a direct one-pass sketch over the raw
    * table (ExportOpsSpec asserts equality, plus a ≤5% error bound vs
    * exact COUNT DISTINCT). Sketch binaries have no SQL-portable
    * oracle (the q23/q122 pattern) → driver records rows>0; the spec
    * carries the numeric gate.
    */
  def q135(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = PipelineOps.layoutDir(spark, dir, "hllrollup")
    t(spark, dir, "events")
      .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
      .agg(hll_sketch_agg($"user_id").as("user_sketch"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(s"$out/daily")
    spark.read.parquet(s"$out/daily")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"),
        sum($"n_events").as("n_events"),
        hll_sketch_estimate(hll_union_agg($"user_sketch")).as("approx_users"))
      .orderBy($"event_type".asc_nulls_first)
  }

  /** Q136 — DETERMINISTIC SHARD EXPORT: assign every document a shard
    * by md5-hash (`hash32(doc_id) mod` [[NumShards]]), write the corpus
    * as one `shard=N/` partition directory per shard, and report the
    * per-shard manifest (docs, chars, id range) read back FROM THE
    * EXPORTED FILES — the reproducible final layout a trainer's data
    * loader consumes. Hash sharding (not round-robin) means re-running
    * the export on any cluster layout yields byte-identical shard
    * membership, and the manifest-vs-oracle hash gate proves the files
    * on disk contain exactly the assigned rows.
    *
    * Scale shape: one hash shuffle on the shard key, then a partitioned
    * write; each shard is a self-contained file set a loader can mount
    * independently (the manifest is the loader's index).
    */
  val NumShards = 8

  def q136(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = PipelineOps.layoutDir(spark, dir, "shardexport")
    t(spark, dir, "documents")
      .select($"doc_id", $"n_chars",
        pmod(TextOps.hash32($"doc_id".cast(StringType)), lit(NumShards))
          .as("shard"))
      .repartition($"shard")
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/shards")
    spark.read.parquet(s"$out/shards")
      .groupBy($"shard".cast(LongType).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast(LongType).as("sum_chars"),
        min($"doc_id").as("min_doc_id"),
        max($"doc_id").as("max_doc_id"))
      .orderBy($"shard".asc_nulls_first)
  }

  val q136Sql: String =
    s"""SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % $NumShards AS shard,
       |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       |  MIN(doc_id) AS min_doc_id, MAX(doc_id) AS max_doc_id
       |FROM documents
       |GROUP BY 1
       |ORDER BY shard NULLS FIRST""".stripMargin

  /** Number of shuffled training shards q139 exports. */
  val NumShufShards = 16

  /** Q139 — SHUFFLED SHARD EXPORT (training order): the global
    * pseudo-random shuffle a trainer consumes, without `rand()` and
    * without a single-partition global sort. Every doc gets a
    * deterministic shuffle key `md5('shuf42:' || doc_id)`; its first
    * byte picks one of [[NumShufShards]] shards, and docs are written
    * `partitionBy(shard)` SORTED by the key within each shard — readers
    * interleave shards to reconstruct a uniform shuffled order. The
    * manifest is computed FROM the exported files and carries an
    * ORDER-SENSITIVE checksum per shard (Σ rankₖ·doc_id over the
    * PHYSICAL within-shard row order, `_metadata` file/row-index — the
    * oracle ranks by the rule, so a scrambled on-disk order fails the
    * hash, not just a spec): two engines agree on it only if they agree
    * on every position of every shard — the property "the shuffle is
    * deterministic and portable" stated as one BIGINT per shard.
    *
    * Scale shape: key + shard are map-side expressions; ONE shard
    * shuffle; the within-shard sort and the rank window both run per
    * shard in parallel (no global ordering step anywhere). At 100 TB,
    * shard count scales with the corpus and each shard stays
    * executor-sized.
    */
  def q139(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = PipelineOps.layoutDir(spark, dir, "shufexport")
    val keyed = t(spark, dir, "documents").select($"doc_id",
      md5(concat(lit("shuf42:"), $"doc_id".cast(StringType))).as("k"))
      .withColumn("shard",
        expr(s"CAST(conv(substr(k, 1, 2), 16, 10) AS INT) % $NumShufShards"))
    // sort by (shard, k), not k alone: the dynamic-partition writer
    // requires task rows ordered by the partition column and would insert
    // its own UNSTABLE shard-only sort, scrambling k within each shard —
    // pre-sorting on both satisfies the requirement so no sort is added
    // and files carry the shuffle order physically.
    keyed.repartition($"shard").sortWithinPartitions($"shard", $"k")
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/shards")
    // the manifest rank is the PHYSICAL row position in the exported
    // files (parquet `_metadata` file name + row index, q150's pattern),
    // NOT a re-sort by the shuffle key: a writer that scrambled the
    // on-disk order would produce a different Σ rankₖ·doc_id than the
    // oracle (which ranks by the rule) and fail the hash — the claim
    // "files carry the shuffle order physically" is itself oracle-guarded
    val back = spark.read.parquet(s"$out/shards")
      .select(col("*"), col("_metadata.file_name").as("phys_file"),
        col("_metadata.row_index").as("phys_row"))
    val w = Window.partitionBy($"shard").orderBy($"phys_file".asc, $"phys_row".asc)
    back.withColumn("rn", row_number().over(w))
      .groupBy($"shard".cast(LongType).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"rn".cast(LongType) * $"doc_id").cast(LongType).as("ord_checksum"),
        min_by($"doc_id", $"rn").as("first_doc"),
        max_by($"doc_id", $"rn").as("last_doc"))
      .orderBy($"shard".asc_nulls_first)
  }

  val q139Sql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS k
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, k,
       |    CAST(('0x' || substr(k, 1, 2)) AS INT) % $NumShufShards AS shard
       |  FROM keyed),
       |r AS (
       |  SELECT doc_id, k, shard,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k) AS rn
       |  FROM sh)
       |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
       |  CAST(SUM(rn * doc_id) AS BIGINT) AS ord_checksum,
       |  arg_min(doc_id, k) AS first_doc, arg_max(doc_id, k) AS last_doc
       |FROM r GROUP BY 1 ORDER BY shard NULLS FIRST""".stripMargin

  /** Q150 — CURRICULUM SHARD EXPORT: q139 exports in shuffled order;
    * this is the other training-order regime — easy-to-hard curriculum.
    * Every document gets the q65 quality score (same native expression,
    * 6dp-rounded so banding is engine-exact); shards are ABSOLUTE score
    * bands (⌊(score+0.5)·NumShards/2⌋ clamped — a map-only value bucket,
    * deliberately NOT a global rank: rank-based NTILE needs a global
    * sort or a sampled range partitioner, the first doesn't scale and
    * the second isn't deterministic). Within each shard docs are written
    * physically sorted by (score, doc_id) — the (shard, …) sort prefix
    * keeps the dynamic-partition writer from inserting its unstable
    * shard-only re-sort (q139's trap) — and the manifest is computed
    * FROM the exported files: per shard the doc count, the
    * order-sensitive Σ rankₖ·doc_id checksum ranked by PHYSICAL row
    * position (`_metadata` file/row-index — so a scrambled on-disk order
    * fails the hash, not just the spec's per-file scan), the first/last
    * doc in curriculum order, and the score range the band covers.
    * Band populations are uneven by design — bands are semantic; q136's
    * balanced hash shards are the rebalancing tool if a trainer needs
    * even file sizes.
    */
  val NumCurrShards = 8

  def q150(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val out = PipelineOps.layoutDir(spark, dir, "currexport")
    val scored = t(spark, dir, "documents")
      .select($"doc_id", TextOps.qualityScore($"text").as("score"))
      .withColumn("shard", least(lit(NumCurrShards - 1),
        greatest(lit(0),
          floor(($"score" + 0.5) * (NumCurrShards / 2.0)).cast(IntegerType))))
    scored.repartition($"shard")
      .sortWithinPartitions($"shard", $"score", $"doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(s"$out/shards")
    // the manifest rank is the PHYSICAL row position in the exported
    // files (parquet `_metadata` file name + row index), NOT a re-sort by
    // the curriculum rule: a writer that scrambled the on-disk order
    // would produce a different Σ rankₖ·doc_id than the oracle (which
    // ranks by the rule) and fail the hash — the claim "files carry
    // curriculum order physically" is itself oracle-guarded
    val back = spark.read.parquet(s"$out/shards")
      .select(col("*"), col("_metadata.file_name").as("phys_file"),
        col("_metadata.row_index").as("phys_row"))
    val w = Window.partitionBy($"shard").orderBy($"phys_file".asc, $"phys_row".asc)
    back.withColumn("rn", row_number().over(w))
      .groupBy($"shard".cast(LongType).as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum($"rn".cast(LongType) * $"doc_id").cast(LongType).as("ord_checksum"),
        min_by($"doc_id", $"rn").as("first_doc"),
        max_by($"doc_id", $"rn").as("last_doc"),
        min($"score").as("min_score"),
        max($"score").as("max_score"))
      .orderBy($"shard".asc_nulls_first)
  }

  val q150Sql: String =
    s"""${LlmOps.tokCte},
       |scored AS (
       |  SELECT d.doc_id, ${LlmOps.scoreSqlExpr("d.text", "t.toks")} AS score
       |  FROM documents d JOIN tok t ON d.doc_id = t.doc_id),
       |sh AS (
       |  SELECT doc_id, score,
       |    LEAST(${NumCurrShards - 1}, GREATEST(0,
       |      CAST(FLOOR((score + 0.5) * ${NumCurrShards / 2.0}) AS INT))) AS shard
       |  FROM scored),
       |r AS (
       |  SELECT doc_id, score, shard,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY score, doc_id) AS rn
       |  FROM sh)
       |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
       |  CAST(SUM(rn * doc_id) AS BIGINT) AS ord_checksum,
       |  arg_min(doc_id, rn) AS first_doc, arg_max(doc_id, rn) AS last_doc,
       |  MIN(score) AS min_score, MAX(score) AS max_score
       |FROM r GROUP BY 1 ORDER BY shard NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q133_source_cap" -> (q133 _),
    "q134_doc_chunks" -> (q134 _),
    "q135_sketch_rollup" -> (q135 _),
    "q136_shard_export" -> (q136 _),
    "q139_shuffle_export" -> (q139 _),
    "q143_mixture_budget_cap" -> (q143 _),
    "q150_curriculum_export" -> (q150 _))

  def oracles: Map[String, String] = Map(
    "q133_source_cap" -> q133Sql,
    "q134_doc_chunks" -> q134Sql,
    "q136_shard_export" -> q136Sql,
    "q139_shuffle_export" -> q139Sql,
    "q143_mixture_budget_cap" -> q143Sql,
    "q150_curriculum_export" -> q150Sql)
}
