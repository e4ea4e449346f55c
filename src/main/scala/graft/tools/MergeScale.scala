package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.StreamingQueries

/** Scale smoke for the r10 segmented-merge claim: q132's per-batch commit
  * cost must be O(batch), NOT O(corpus). Replicates the corpus k× with
  * re-keyed ids (ScaleCheck's trick), splits it into B disjoint batches,
  * and drives the REAL `dedupMergeFn` batch-by-batch, timing each commit
  * while the accumulated corpus grows B×. As the counterfactual, after
  * each commit it also times what the pre-r10 design paid: reading the
  * full current corpus back and rewriting it (`unionByName` + overwrite
  * was exactly that). Evidence = commit_sec stays flat while
  * rewrite_sec grows with the corpus — measured, not asserted.
  *
  * Usage: MergeScale [k] [batches]  (defaults 4, 8; SPARK_GRAFT_SF_DIR
  * selects the corpus). Prints ONE JSON line.
  */
object MergeScale {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(4)
    val b = args.lift(1).map(_.toInt).getOrElse(8)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // The measurement needs the corpus to GROW across batches, so docs
    // get UNIQUE pseudo-text derived from their id (chained md5 tokens:
    // SimHash fingerprints land far apart and nothing is gated away).
    // The fixture's own templated text is so self-similar under a 32-bit
    // SimHash that ~97% of any replica corpus drops as near-dups — the
    // right behavior for q132, the wrong fixture for measuring merge I/O.
    val base = graft.core.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang", $"n_chars")
    val stride = base.agg(max($"doc_id")).head.getLong(0) + 1L
    val uniqueText = concat_ws(" ", (0 until 12).map(j =>
      md5(concat($"doc_id".cast(org.apache.spark.sql.types.StringType),
        lit(s"_$j")))): _*)
    val docs = (0 until k).map { i =>
      base.select(($"doc_id" + lit(i.toLong * stride)).as("doc_id"),
        $"lang", $"n_chars")
    }.reduce(_ unionByName _)
      .select($"doc_id", uniqueText.as("text"), $"lang", $"n_chars")
      .cache()
    val nDocs = docs.count()

    def dirBytes(p: java.nio.file.Path): Long = {
      val f = p.toFile
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else Option(f.listFiles()).toSeq.flatten
        .map(c => dirBytes(c.toPath)).sum
    }

    val root = java.nio.file.Files.createTempDirectory("graft_mergescale")
    val merge = StreamingQueries.dedupMergeFn(
      StreamingQueries.neardupIndex(docs), root)
    val rewriteDir = root.resolve("counterfactual").toString

    val rows = (0 until b).map { i =>
      val batch = StreamingQueries.bandedDocs(
        docs.filter(pmod($"doc_id", lit(b.toLong)) === i.toLong))
      var t0 = System.nanoTime()
      merge(batch.toDF(), i.toLong)
      val commitSec = (System.nanoTime() - t0) / 1e9
      val cur = StreamingQueries.dedupCurrent(spark, root).get
      val corpusRows = cur.count()
      // bytes THIS commit physically wrote (its segment) vs bytes a
      // rewrite-per-batch design would write (the whole corpus) — the
      // deterministic I/O-volume evidence behind the wall-clock numbers
      val segBytes = dirBytes(root.resolve(s"seg$i"))
      // the pre-r10 counterfactual: full corpus read + overwrite per batch
      t0 = System.nanoTime()
      cur.write.mode("overwrite").parquet(rewriteDir)
      val rewriteSec = (System.nanoTime() - t0) / 1e9
      val rewriteBytes = dirBytes(java.nio.file.Paths.get(rewriteDir))
      f"""{"batch":$i,"commit_sec":$commitSec%.2f,"seg_bytes":$segBytes,"corpus_rows":$corpusRows,"rewrite_sec":$rewriteSec%.2f,"rewrite_bytes":$rewriteBytes}"""
    }
    // The takedown verb (q154): revoke 3 ids that live in batch b-1's
    // segment ONLY (batches split by doc_id mod b, so the id classes are
    // segment-disjoint) via a parquet-pushable isin list — the claim
    // under measurement is that deleteWhere REWRITES the one touched
    // segment while the corpus-rewrite counterfactual (timed right
    // after, same corpus) pays the whole table. Runs BEFORE compaction,
    // while the target still holds b segments.
    val target = graft.ops.VersionedTarget.Segmented(root)
    val victims = docs.filter(pmod($"doc_id", lit(b.toLong)) === (b - 1).toLong)
      .orderBy($"doc_id".asc).limit(3)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    var t0 = System.nanoTime()
    val del = target.deleteWhere(spark, $"doc_id".isin(victims: _*))
    val takedownSec = (System.nanoTime() - t0) / 1e9
    require(del.exists(_.touched == Seq(s"seg${b - 1}")),
      s"takedown must touch exactly seg${b - 1}, got $del")
    val delBytes = dirBytes(root.resolve(del.get.segment))
    t0 = System.nanoTime()
    target.current(spark).get.write.mode("overwrite").parquet(rewriteDir)
    val corpusRewriteSec = (System.nanoTime() - t0) / 1e9
    val corpusBytes = dirBytes(java.nio.file.Paths.get(rewriteDir))
    target.vacuum(1): Unit // retire the pre-takedown versions
    val takedownLine =
      f""""takedown":{"victims":${victims.size},"segments":$b,"touched":${del.get.touched.size},"takedown_sec":$takedownSec%.2f,"rewritten_bytes":$delBytes,"corpus_rewrite_sec":$corpusRewriteSec%.2f,"corpus_bytes":$corpusBytes}"""

    // The compaction counter-move (q145): after b O(batch) commits the
    // scan pays b file listings/footers; fold once and measure what a
    // post-compaction reader pays. files_before/after counts the parquet
    // part files a manifest scan touches — the per-task scheduling unit
    // the 100 TB projection cares about.
    def manifestFiles(): Int = {
      val v = graft.ops.VersionedTarget.currentVersion(root).get
      target.segmentsOf(v).map { seg =>
        Option(root.resolve(seg).toFile.listFiles()).toSeq.flatten
          .count(_.getName.endsWith(".parquet"))
      }.sum
    }
    val filesBefore = manifestFiles()
    t0 = System.nanoTime()
    val preScan = target.current(spark).get.count()
    val scanBeforeSec = (System.nanoTime() - t0) / 1e9
    t0 = System.nanoTime()
    target.compact(spark): Unit
    val compactSec = (System.nanoTime() - t0) / 1e9
    target.vacuum(1): Unit
    val filesAfter = manifestFiles()
    t0 = System.nanoTime()
    val postScan = target.current(spark).get.count()
    val scanAfterSec = (System.nanoTime() - t0) / 1e9
    require(postScan == preScan, s"compaction changed rows: $preScan -> $postScan")
    val compactLine =
      f""""compact":{"files_before":$filesBefore,"files_after":$filesAfter,"compact_sec":$compactSec%.2f,"scan_before_sec":$scanBeforeSec%.2f,"scan_after_sec":$scanAfterSec%.2f,"rows":$postScan}"""
    println(s"""{"k":$k,"batches":$b,"n_docs":$nDocs,"per_batch":[${rows.mkString(",")}],$takedownLine,$compactLine,"sf":"$sfDir"}""")
    spark.stop()
  }
}
