package graft

import org.apache.spark.sql.functions._
import graft.queries.ExportOps

/** Round-9 export operators (q133–q136): the invariants the DuckDB
  * hash-gate can't see — the source cap is exact and the kept subset is
  * a deterministic function of ids (not arrival order), chunking covers
  * every character and the plan stays shuffle-free, merged daily HLL
  * sketches equal a direct global sketch (register-max union is
  * lossless for union), and the exported shard files hold exactly the
  * assigned rows.
  */
class ExportOpsSpec extends SparkSpec {

  test("q133: cap enforced per source; membership is id-determined, not order-determined") {
    import spark.implicits._
    val out = ExportOps.q133(spark, sfDir).cache()
    try {
      val perSource = out.groupBy($"source").agg(count(lit(1)).as("n"))
      assert(perSource.filter($"n" > ExportOps.SourceCap).isEmpty,
        s"a source exceeds the ${ExportOps.SourceCap}-doc cap")
      // every source with >= cap docs in the corpus is filled to the cap
      val corpus = graft.core.Tables.t(spark, sfDir, "documents")
        .groupBy($"source").agg(count(lit(1)).as("avail"))
      val underfilled = perSource.join(corpus, "source")
        .filter($"avail" >= ExportOps.SourceCap && $"n" =!= ExportOps.SourceCap)
      assert(underfilled.isEmpty, "cap not filled from a source with enough docs")
      // determinism: re-running on a differently-partitioned input keeps
      // the exact same doc_ids (the keep rule reads ids, not layout)
      val again = ExportOps.q133(spark, sfDir)
      assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
        again.select("doc_id").exceptAll(out.select("doc_id")).isEmpty,
        "kept set changed across runs")
      // the rank<=K filter plans as WindowGroupLimit (per-group heap),
      // not a full per-group sort feeding a post-filter
      val plan = ExportOps.q133(spark, sfDir).queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"expected WindowGroupLimit pushdown in:\n$plan")
    } finally out.unpersist(): Unit
  }

  test("q143: kept prefix is maximal within each source's budget and the " +
      "tempered split boosts small sources vs proportional") {
    import spark.implicits._
    val out = ExportOps.q143(spark, sfDir).collect().toSeq
    // recompute the whole keep rule in memory (sf0.001 is collect-sized):
    // integer-sqrt weights, integer budget split, md5-priority prefix
    val docs = graft.core.Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"source", $"n_chars",
        graft.ops.TextOps.hash32($"doc_id".cast("string")).as("pri"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mass = docs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val w = mass.view.mapValues(m => math.sqrt(m.toDouble).toLong).toMap
    val budget = {
      val b = mass.values.sum / ExportOps.MixtureBudgetDiv
      val wTot = w.values.sum
      w.view.mapValues(ws => b * ws / wTot).toMap
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, rows) =>
      var cum = 0L
      rows.sortBy(r => (r._4, r._1)).toSeq.takeWhile { r =>
        cum += r._3; cum <= budget(src)
      }.map(_._1)
    }.toSet
    assert(out.map(_.getLong(0)).toSet == expected,
      "kept set differs from the in-memory keep rule")
    // within budget, and maximal: per source, kept chars + the FIRST
    // dropped doc's chars would cross the line
    val bySrc = out.groupBy(_.getString(1))
    bySrc.foreach { case (src, rows) =>
      val kept = rows.map(_.getLong(2)).sum
      assert(kept <= budget(src), s"$src exceeds its budget")
      val keptIds = rows.map(_.getLong(0)).toSet
      docs.filter(d => d._2 == src && !keptIds.contains(d._1))
        .minByOption(d => (d._4, d._1)).foreach { firstDropped =>
          assert(kept + firstDropped._3 > budget(src),
            s"$src dropped ${firstDropped._1} although it still fits")
        }
    }
    // temperature: the LARGEST source's budget share sits BELOW its raw
    // char share, the smallest above (⌊√m⌋ flattens the mixture)
    val corpus = mass.values.sum
    val bTot = budget.values.sum.toDouble
    if (mass.size > 1 && mass.values.toSet.size > 1) {
      val big = mass.maxBy(_._2)._1
      val small = mass.minBy(_._2)._1
      assert(budget(big) / bTot < mass(big).toDouble / corpus,
        "tempering must shrink the dominant source's share")
      assert(budget(small) / bTot > mass(small).toDouble / corpus,
        "tempering must boost the smallest source's share")
    }
  }

  test("q134: chunks tile every document with full coverage at the declared stride") {
    import spark.implicits._
    val out = ExportOps.q134(spark, sfDir).cache()
    try {
      val docs = graft.core.Tables.t(spark, sfDir, "documents")
        .filter($"n_chars" > 0)
      // one chunk per stride window: ceil(n_chars / stride)
      val expected = docs.select(
        sum(ceil($"n_chars" / ExportOps.ChunkStride)).as("n")).as[Long].head()
      assert(out.count() == expected,
        s"chunk count != sum(ceil(n_chars/stride)) = $expected")
      // offsets are exactly 0, stride, 2*stride... and every chunk is
      // non-empty (the last window starts strictly inside the doc)
      assert(out.filter($"chunk_start" =!= $"chunk_id" * ExportOps.ChunkStride).isEmpty)
      assert(out.filter($"n_chunk_chars" <= 0 ||
        $"n_chunk_chars" > ExportOps.ChunkChars).isEmpty)
      // map-only: no exchange anywhere in the pre-sort plan
      val plan = graft.core.Tables.t(spark, sfDir, "documents")
        .filter($"n_chars" > 0)
        .select($"doc_id", explode(sequence(lit(0),
          ($"n_chars" - 1).cast("int"), lit(ExportOps.ChunkStride))).as("s"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"chunk fan-out should be map-only:\n$plan")
    } finally out.unpersist(): Unit
  }

  test("q135: merged daily sketches equal a direct global sketch and stay within 5% of exact") {
    import spark.implicits._
    val out = ExportOps.q135(spark, sfDir).cache()
    try {
      val events = graft.core.Tables.t(spark, sfDir, "events")
      val direct = events.groupBy($"event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg($"user_id")).as("direct_users"))
      val exact = events.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_users"))
      val joined = out.join(direct, "event_type").join(exact, "event_type")
        .select($"event_type", $"approx_users", $"direct_users", $"exact_users")
        .as[(String, Long, Long, Long)].collect()
      assert(joined.nonEmpty)
      joined.foreach { case (et, approx, dir0, exact0) =>
        assert(approx == dir0,
          s"$et: merged-daily estimate $approx != direct estimate $dir0 — union must be lossless")
        assert(math.abs(approx - exact0) <= math.max(1L, exact0 / 20),
          s"$et: approx $approx vs exact $exact0 breaches 5% bound")
      }
      // the daily sketch table really was persisted (stage-1 artifact)
      val daily = spark.read.parquet(
        graft.queries.PipelineOps.layoutDir(spark, sfDir, "hllrollup") + "/daily")
      assert(daily.count() == events
        .select(date_trunc("day", $"ts"), $"event_type").distinct().count())
    } finally out.unpersist(): Unit
  }

  test("q136: shard files on disk hold exactly the assigned rows; shards partition the corpus") {
    import spark.implicits._
    val out = ExportOps.q136(spark, sfDir).cache()
    try {
      val docs = graft.core.Tables.t(spark, sfDir, "documents")
      assert(out.select(sum($"n_docs")).as[Long].head() == docs.count(),
        "shards must partition the corpus")
      assert(out.count() <= ExportOps.NumShards)
      // re-read one shard directory directly and check membership matches
      // the hash rule (files on disk == assignment, not just the manifest)
      val root = graft.queries.PipelineOps.layoutDir(spark, sfDir, "shardexport")
      val shard0 = spark.read.parquet(s"$root/shards/shard=0")
        .select($"doc_id").as[Long].collect().toSet
      val expected0 = docs.select($"doc_id",
          pmod(graft.ops.TextOps.hash32($"doc_id".cast("string")),
            lit(ExportOps.NumShards)).as("s"))
        .filter($"s" === 0).select($"doc_id").as[Long].collect().toSet
      assert(shard0 == expected0, "shard=0 files diverge from the hash assignment")
    } finally out.unpersist(): Unit
  }

  test("q150: curriculum bands are score-disjoint and shard files are " +
      "physically written easy-to-hard") {
    import spark.implicits._
    val out = ExportOps.q150(spark, sfDir).cache()
    try {
      val docs = graft.core.Tables.t(spark, sfDir, "documents")
      assert(out.select(sum($"n_docs")).as[Long].head() == docs.count(),
        "curriculum shards must partition the corpus")
      // absolute value bands: every score in shard i is strictly below
      // every score in any higher shard
      val bands = out.select($"shard", $"min_score", $"max_score")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .sortBy(_._1)
      bands.sliding(2).foreach {
        case Array((s1, _, hi), (s2, lo, _)) =>
          assert(hi <= lo, s"bands $s1/$s2 overlap: max $hi vs min $lo")
        case _ =>
      }
      // physical curriculum order inside each file of the easiest band
      val root = graft.queries.PipelineOps.layoutDir(spark, sfDir, "currexport")
      val shardDirs = new java.io.File(s"$root/shards")
        .listFiles().filter(_.getName.startsWith("shard="))
      assert(shardDirs.length > 1, "fixture collapsed into a single band")
      for (d <- shardDirs; f <- d.listFiles() if f.getName.endsWith(".parquet")) {
        val scores = spark.read.parquet(f.getAbsolutePath)
          .select($"score").as[Double].collect()
        assert(scores.sameElements(scores.sorted),
          s"${d.getName}/${f.getName}: rows not in curriculum order")
      }
    } finally out.unpersist(): Unit
  }

  test("q139: exported shard files physically carry the shuffle order") {
    import spark.implicits._
    val out = ExportOps.q139(spark, sfDir).cache()
    try {
      val docs = graft.core.Tables.t(spark, sfDir, "documents")
      assert(out.select(sum($"n_docs")).as[Long].head() == docs.count(),
        "shuffled shards must partition the corpus")
      assert(out.count() <= ExportOps.NumShufShards)
      // The manifest checksum proves LOGICAL order agreement with the
      // oracle; this proves the files are PHYSICALLY written in that
      // order — a trainer streaming a shard file sequentially reads the
      // shuffle order with no sort on its side. Spark preserves
      // within-file row order on a single-file read, so a per-file
      // monotonic id must be k-ascending.
      val root = graft.queries.PipelineOps.layoutDir(spark, sfDir, "shufexport")
      val files = new java.io.File(s"$root/shards/shard=0")
        .listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.nonEmpty, "shard=0 produced no parquet files")
      for (f <- files) {
        val ks = spark.read.parquet(f.getAbsolutePath)
          .select($"k").as[String].collect()
        assert(ks.sameElements(ks.sorted),
          s"${f.getName}: rows not written in shuffle-key order")
      }
    } finally out.unpersist(): Unit
  }
}
