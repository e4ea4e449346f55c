package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{EngineContext, Tables}
import graft.core.Tables.t
import graft.exec.{JobRunner, StatusRegistry, TaskRegistry}
import graft.exec.Tasks.TaskSpec
import graft.model.EtlModel
import graft.ops.{MinHashDedup, TextOps}
import graft.streaming.StreamOps

/** Q141 — the END-TO-END CORPUS LIFECYCLE: the full training-corpus
  * pipeline composed as ONE registered model running through the task
  * lifecycle (A5–A13: registry gate, job group, status tables, per-task
  * cache + scratch scopes) — the demonstration that the exec layer and
  * the query library are one engine, the way the reference runs a
  * registered `ayeaye.Model` end-to-end
  * (/root/reference/lib/fossa/control/process.py:89-100).
  */
object LifecycleOps {

  /** The composed pipeline, one stage per shipped query's rule:
    *
    *  1. INGEST + DEDUP (q132): stream the documents through the
    *     SimHash near-dup gate and merge survivors into the segmented
    *     versioned target — exactly-once, arrival-order-free.
    *  2. SOURCE CAP (q133): at most [[ExportOps.SourceCap]] surviving
    *     docs per source by deterministic md5 priority.
    *  3. DECONTAMINATE (q140, scoped to the capped corpus): md5-bucket
    *     train/val/test split; drop every TRAIN doc that 5-gram-Jaccard
    *     near-duplicates any val/test doc.
    *  4. SHARD (q139): deterministic shuffled shard export of the final
    *     train corpus; the returned manifest carries each shard's
    *     order-sensitive checksum, so ANY wrong keep/drop decision in
    *     ANY stage changes the result.
    *
    * Scale shape is inherited stage-by-stage from the queries it
    * composes: (band,bv) equi-join gate + O(batch) segment merges, one
    * source shuffle with WindowGroupLimit, asymmetric train-vs-eval band
    * join sized by the contamination rate, and one shard shuffle with
    * per-shard parallel sorts. Intermediate corpora flow as DataFrames —
    * nothing materializes except the versioned dedup target and the
    * final shards, both task-scratch-scoped.
    */
  final class CorpusLifecycleModel extends EtlModel {
    override def name: String = "CorpusLifecycle"

    override def build(ctx: EngineContext): DataFrame = {
      val spark = ctx.spark
      import spark.implicits._
      val dir = ctx.resolve("{data_dir}")
      val out = graft.core.Scratch.deleteOnExit(ctx.resolve("{output}"))
      val docs = t(spark, dir, "documents")

      // stage 1 — streaming incremental dedup into a segmented target,
      // through the STATS path (q146): each batch commits its survivor
      // segment plus a per-segment (lang → docs, chars) artifact
      val dedupRoot = java.nio.file.Paths.get(out, "dedup")
      val statsRoot = dedupRoot.resolve("stats")
      java.nio.file.Files.createDirectories(dedupRoot)
      val banded = StreamingQueries.bandedDocs(
        StreamOps.docsStream(spark, dir)
          .select($"doc_id", $"text", $"lang", $"n_chars"))
      StreamOps.runForeachBatch(banded,
        StreamingQueries.statsMergeFn(
          StreamingQueries.neardupIndex(docs), dedupRoot, statsRoot))
      // ingest-cadence maintenance (q145 × q146): fold the per-batch
      // segments into one bin-packed segment — content-invariant (the
      // oracle doesn't change), the later stages read 1 segment instead
      // of 1/batch — and carry the stats forward by SUMMING the folded
      // artifacts inside the pointer transaction, so the metadata-only
      // rollup stays answerable after the fold
      val target = graft.ops.VersionedTarget.Segmented(dedupRoot)
      StreamingQueries.statsPreservingCompact(spark, dedupRoot, statsRoot): Unit
      StreamingQueries.statsVacuum(statsRoot,
        target.vacuum(graft.ops.VersionedTarget.DefaultRetain))
      val survivors = StreamingQueries.dedupCurrent(spark, dedupRoot)
        .getOrElse(sys.error("dedup stage committed no version"))
      // the composition invariant, checked in-line where a production
      // operator would alert on it: the metadata-only rollup over the
      // post-compaction artifacts must agree with the corpus itself
      val rolled = StreamingQueries.statsRollup(spark, dedupRoot, statsRoot)
        .agg(sum($"n_docs")).head.getLong(0)
      val corpusDocs = survivors.count()
      require(rolled == corpusDocs,
        s"stats rollup ($rolled docs) diverged from corpus ($corpusDocs) after compaction")
      val survivorIds = survivors.select($"doc_id")

      // stage 2 — per-source cap over the survivors (q133 rule)
      val surv = docs.join(survivorIds, Seq("doc_id"), "left_semi")
      val pri = TextOps.hash32($"doc_id".cast(StringType))
      val capW = Window.partitionBy($"source").orderBy(pri.asc, $"doc_id".asc)
      val capped = surv
        .withColumn("keep_rank", row_number().over(capW))
        .filter($"keep_rank" <= ExportOps.SourceCap)
        .select($"doc_id", $"text")

      // stage 3 — split + decontaminate the capped corpus (q140 rule)
      val bucket = expr(
        "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) % 10")
      val withSplit = capped.select($"doc_id", $"text",
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
      val train = withSplit.filter($"split" === "train")
      val eval = withSplit.filter($"split" =!= "train")
      val contaminated = MinHashDedup.crossNgramPairs(
          train, eval, "doc_id", "text",
          gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
        .select($"in_id".as("doc_id")).distinct()
      val finalTrain = train.select($"doc_id")
        .join(contaminated, Seq("doc_id"), "left_anti")

      // stage 4 — shuffled shard export of the final corpus (q139 rule)
      val keyed = finalTrain.select($"doc_id",
          md5(concat(lit("shuf42:"), $"doc_id".cast(StringType))).as("k"))
        .withColumn("shard",
          expr(s"CAST(conv(substr(k, 1, 2), 16, 10) AS INT) % ${ExportOps.NumShufShards}"))
      keyed.repartition($"shard").sortWithinPartitions($"shard", $"k")
        .write.mode("overwrite").partitionBy("shard").parquet(s"$out/shards")
      val back = spark.read.parquet(s"$out/shards")
      val rnW = Window.partitionBy($"shard").orderBy($"k")
      val manifest = back.withColumn("rn", row_number().over(rnW))
        .groupBy($"shard".cast(LongType).as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum($"rn".cast(LongType) * $"doc_id").cast(LongType).as("ord_checksum"),
          min_by($"doc_id", $"k").as("first_doc"),
          max_by($"doc_id", $"k").as("last_doc"))
      manifest.write.mode("overwrite").parquet(s"$out/manifest")
      spark.read.parquet(s"$out/manifest")
    }
  }

  /** Q141 — run [[CorpusLifecycleModel]] through the full task lifecycle
    * and return the final shard manifest (the q57 pattern: registry gate
    * → runSync under a job group → status must read `complete`).
    */
  def q141(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val registry = new TaskRegistry
    val status = new StatusRegistry
    val runner = new JobRunner(spark, registry, status, maxConcurrentTasks = 2)
    registry.register(new CorpusLifecycleModel)
    val spec = TaskSpec(modelClass = "CorpusLifecycle")
    val outBase = s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}" +
      s"/graft_scratch/q141_${spec.taskId}"
    val specWithCtx = spec.copy(
      resolverContext = Map("data_dir" -> dir, "output" -> outBase))
    try {
      runner.runSync(specWithCtx)
      require(status.status(spec.taskId) == "complete",
        s"lifecycle task ended ${status.status(spec.taskId)}")
    } finally runner.close()
    spark.read.parquet(s"$outBase/manifest")
      .orderBy($"shard".asc_nulls_first)
  }

  /** The composed batch rule: each stage's shipped oracle chained over
    * the previous stage's output (dedup over documents, cap over
    * survivors, split + contamination over the capped corpus, shard over
    * the final train set). The ngram pair CTEs are prefixed `n` to
    * coexist with the SimHash CTEs' names in one WITH list.
    */
  val q141Sql: String =
    s"""${StreamingQueries.simhashCtes},
       |dropped AS (
       |  SELECT DISTINCT a.doc_id AS d
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.bv = b.bv AND b.doc_id < a.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
       |surv AS (
       |  SELECT doc_id, text, source FROM documents
       |  WHERE doc_id NOT IN (SELECT d FROM dropped)),
       |capped AS (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT),
       |                 doc_id) AS kr
       |    FROM surv)
       |  WHERE kr <= ${ExportOps.SourceCap}),
       |${LlmOps.ngramPairCtesOver("capped", "n")},
       |sp AS (
       |  SELECT doc_id, CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
       |                      ELSE 'test' END AS split
       |  FROM (SELECT doc_id,
       |          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) % 10 AS b
       |        FROM capped)),
       |cp AS (
       |  SELECT CASE WHEN sa.split = 'train' THEN p.d1 ELSE p.d2 END AS in_id
       |  FROM npairs p JOIN sp sa ON sa.doc_id = p.d1
       |               JOIN sp sb ON sb.doc_id = p.d2
       |  WHERE (sa.split = 'train') <> (sb.split = 'train')),
       |fin AS (
       |  SELECT doc_id FROM sp
       |  WHERE split = 'train' AND doc_id NOT IN (SELECT in_id FROM cp)),
       |keyed AS (
       |  SELECT doc_id, md5('shuf42:' || CAST(doc_id AS VARCHAR)) AS k FROM fin),
       |sh AS (
       |  SELECT doc_id, k,
       |    CAST(('0x' || substr(k, 1, 2)) AS INT) % ${ExportOps.NumShufShards} AS shard
       |  FROM keyed),
       |r AS (
       |  SELECT doc_id, k, shard,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k) AS rn
       |  FROM sh)
       |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
       |  CAST(SUM(rn * doc_id) AS BIGINT) AS ord_checksum,
       |  arg_min(doc_id, k) AS first_doc, arg_max(doc_id, k) AS last_doc
       |FROM r GROUP BY 1 ORDER BY shard NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q141_corpus_lifecycle" -> (q141 _))

  def oracles: Map[String, String] = Map(
    "q141_corpus_lifecycle" -> q141Sql)
}
