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
