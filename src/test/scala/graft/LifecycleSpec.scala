package graft

import org.apache.spark.sql.functions._

import graft.queries.{ExportOps, LifecycleOps}

/** q141 — the composed corpus lifecycle (dedup → cap → decontaminate →
  * shard) run as ONE registered model through the task lifecycle. The
  * DuckDB hash gate proves value equality with the composed batch rule;
  * this spec pins the lifecycle + composition properties the hash can't
  * see: determinism across runs, that every stage actually binds on the
  * fixture, and that the manifest's shards partition the final corpus.
  */
class LifecycleSpec extends SparkSpec {
  import spark.implicits._

  test("q141 composes all four stages, each stage binds, and reruns are identical") {
    val out = LifecycleOps.q141(spark, sfDir).collect()
    assert(out.nonEmpty, "empty manifest")
    val shards = out.map(_.getLong(0))
    assert(shards.distinct.length == shards.length, "duplicate shard rows")
    assert(shards.forall(s => s >= 0 && s < ExportOps.NumShufShards))
    val finalDocs = out.map(r => r.getAs[Long]("n_docs")).sum

    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val total = docs.count()
    val nSources = docs.select($"source").distinct().count()
    // stage 2 bound: at most SourceCap survivors per source, then stage 3
    // keeps only the ~80% train bucket minus contamination
    assert(finalDocs <= nSources * ExportOps.SourceCap,
      s"final corpus $finalDocs exceeds the source-cap ceiling")
    assert(finalDocs < total,
      "no stage dropped anything — cap/split/dedup never bound on the fixture")
    assert(finalDocs > 0, "pipeline dropped the whole corpus")

    // determinism: the full composition (incl. the streaming dedup and
    // the physical shard export) must reproduce byte-identically
    val again = LifecycleOps.q141(spark, sfDir).collect()
    assert(out.toSeq == again.toSeq, "rerun diverged — pipeline not deterministic")
  }

  test("q168 RAG lifecycle: stages bind (chunk summaries match the rule, " +
      "dedup drops docs, serving stays k-bounded) and reruns are identical") {
    val out = LifecycleOps.q168(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty, "empty served fusion table")
    // serving shape: <= 5 hits per probe, ranks 1..n contiguous
    val byProbe = rows.groupBy(_.getAs[Long]("probe_id"))
    byProbe.foreach { case (p, hits) =>
      val rns = hits.map(_.getAs[Int]("rn")).sorted
      assert(rns.length <= 5 && rns.sameElements(1 to rns.length),
        s"probe $p has ranks ${rns.toSeq}")
    }
    // stage-2 binding: every served hit's chunk summary equals the q134
    // rule recomputed from the raw doc — the result reads the artifact,
    // so this pins artifact == rule
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val byDoc = docs.select($"doc_id", $"n_chars",
        md5(substring($"text", 1, ExportOps.ChunkChars)).as("h"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    rows.foreach { r =>
      val (nChars, headMd5) = byDoc(r.getAs[Long]("cand_id"))
      val expectChunks = if (nChars <= 0) 0L else (nChars + 149) / 150
      assert(r.getAs[Long]("n_chunks") == expectChunks,
        s"chunk count diverged for cand ${r.getAs[Long]("cand_id")}")
      if (nChars > 0)
        assert(r.getAs[String]("head_md5") == headMd5, "head chunk md5 diverged")
    }
    // stage-1 binding: the dedup stage must actually drop something on
    // this corpus (there are true near-dup pairs), so some doc is not
    // its own cluster — recompute the keep count with the shipped rule
    val pairs = graft.ops.MinHashDedup.ngramJaccardPairs(docs, "doc_id",
      "text", gramN = 5, rowsPerBand = 2, minJaccard = 0.5)
    assert(pairs.limit(1).count() == 1, "fixture has no near-dup pairs — " +
      "the dedup stage never binds")
    // determinism: the full composition (measurement, dedup, chunk
    // artifact, index build, serve) must reproduce byte-identically
    val again = LifecycleOps.q168(spark, sfDir).collect()
    assert(rows.toSeq == again.toSeq, "rerun diverged — pipeline not deterministic")
  }

  test("q168's banding actuator: the shipped selection path picks the " +
      "cheapest passing point on the real corpus and FLIPS off wide bands " +
      "on a recall-degraded corpus") {
    // real corpus: every operating point has full recall here, so the
    // decision takes the cheapest (the 2-band/4-row wide setting) — the
    // SLO is met at minimum candidate volume
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val real = LifecycleOps.ragBandingOperatingPoint(docs,
      docs.filter($"doc_id" % 100 === 3))
    assert(real.recall >= LifecycleOps.RagBandingFloor,
      s"real-corpus operating point misses the SLO: ${real.recall}")
    assert(real.rowsPerBand == 4,
      s"full recall everywhere must pick the cheapest point, got ${real.rowsPerBand}")
    // degraded corpus (CurationSpec's ~0.66-jaccard fixture): wide bands
    // miss ~half the true pairs, so the SAME shipped selection path must
    // flip to a narrower banding that meets the 0.95 floor
    def h(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("US-ASCII"))
      .map("%02x".format(_)).mkString
    val rows = (0 until 30).flatMap { p =>
      val shared = (0 until 4).map(k => h(s"shared_${p}_$k")).mkString
      Seq((p.toLong * 2, shared + h(s"uniq_a_$p")),
        (p.toLong * 2 + 1, shared + h(s"uniq_b_$p")))
    }
    val degraded = rows.toDF("doc_id", "text").coalesce(4)
    val flipped = LifecycleOps.ragBandingOperatingPoint(degraded,
      degraded.filter($"doc_id" % 2 === 0))
    assert(flipped.rowsPerBand != 4,
      "a recall-degraded corpus must flip the pipeline off wide bands")
    assert(flipped.recall >= LifecycleOps.RagBandingFloor,
      s"the flipped point must meet the SLO, got ${flipped.recall}")
  }

  test("q141's final corpus is a subset of the capped train split (composition order)") {
    // recompute the stage-2/3 keep sets with the shipped single-stage
    // queries' own rules and check containment: final ⊆ train ⊆ capped
    val manifest = LifecycleOps.q141(spark, sfDir)
    val finalDocs = manifest.agg(sum($"n_docs")).collect()(0).getLong(0)
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
    val bucket = expr(
      "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT) % 10")
    val trainAll = docs.filter(bucket < 8).count()
    assert(finalDocs <= trainAll,
      s"final corpus $finalDocs larger than the whole train split $trainAll")
  }
}
