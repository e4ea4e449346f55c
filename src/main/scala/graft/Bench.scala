package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE compact JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology (documented in BASELINE.md):
  *   - per query: TWO warmup runs (JVM/codegen JIT + page cache — DuckDB has
  *     no analogue of that one-time cost), then THREE timed runs;
  *   - the reported number is the MEDIAN of the three timed runs, so a single
  *     multi-second host stall (this box is multi-tenant) cannot fabricate an
  *     8–14× "regression" the way a min-of-2 could in round 2;
  *   - NOISY-WINDOW REFUSAL: if more than 6 queries show ≥30% run spread
  *     (a contended window, not a regression), every flagged query is
  *     re-measured and the calmer run set kept; a window still contended
  *     after retry is marked "contended":true in the artifact so its
  *     total is never quoted as a headline;
  *   - every run forces FULL materialisation through the `noop` sink so
  *     projections can't be pruned by a count-only action (which would
  *     under-measure; the DuckDB baseline fetches all rows too).
  *
  * Artifact contract: the final stdout line must survive a ~2 KB tail
  * capture, so it uses SHORT keys ("q01".."q81") and 3-decimal seconds
  * (~1.1 KB for 81 queries). The full-name, full-precision per-run detail
  * (all three timed runs + min/median) goes to BENCH_DETAIL.json
  * (override with SPARK_GRAFT_BENCH_DETAIL), which is committed per round.
  */
object Bench {
  private val Warmups = 2
  private val TimedRuns = 3

  def main(args: Array[String]): Unit = {
    // stdout carries exactly ONE JSON line — engine logs must not leak there
    graft.tools.EngineLog.echoToConsole = false
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // benchmark outputs are report-sized by contract → single-partition
      // final sort instead of a range exchange + its sampling job
      .config("spark.graft.smallResultSort", "true")
      // single-row-group fixtures otherwise scan single-threaded (a row
      // group is the minimum split); one memoized ingest rewrite — absorbed
      // by the warmups — lets every scan parallelize. See Tables.sourcePath.
      .config("spark.graft.compactScans", "true")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    final case class Timing(name: String, runs: Seq[Double]) {
      def failed: Boolean = runs.isEmpty
      def median: Double = if (failed) -1.0 else runs.sorted.apply(runs.size / 2)
      def min: Double = if (failed) -1.0 else runs.min
    }

    def timedRuns(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        warmups: Int): Seq[Double] =
      try {
        (1 to warmups).foreach(_ => once(fn))
        (1 to TimedRuns).map { _ =>
          val t0 = System.nanoTime()
          once(fn)
          (System.nanoTime() - t0) / 1e9
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Seq.empty[Double]
      } finally graft.core.CacheScope.releaseAll() // free query-owned caches

    def spreadPct(t: Timing): Long =
      if (t.failed || t.median <= 0) 0L
      else math.round(100.0 * (t.runs.max - t.runs.min) / t.median)

    // Optional substring filter for fast local iteration (mirrors
    // Verify's SPARK_GRAFT_ONLY); the driver never sets it, so its runs
    // always cover the full surface.
    val only = sys.env.get("SPARK_GRAFT_ONLY").filter(_.nonEmpty)
      .map(_.split(',').toSeq.filter(_.nonEmpty))
    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (name, fn) => Timing(name, timedRuns(name, fn, Warmups)) }

    // NOISY-WINDOW REFUSAL (BASELINE.md protocol, codified): a window
    // where many queries show ≥30% run spread is host contention, not
    // regression — r8 committed such a headline (20 flagged queries,
    // total 1.7× the same-day calm pair) and the round's bench read was
    // polluted. Instead of shipping it, re-measure every flagged query
    // (JIT is already hot — one warmup) and keep the calmer run set per
    // query; if the window is STILL contended after the retry, the
    // artifact says so ("contended":true) so no one quotes its total.
    val NoisySpreadPct = 30L
    val MaxNoisyQueries = 6
    val needRetry = firstPass.count(spreadPct(_) >= NoisySpreadPct) > MaxNoisyQueries
    var retried = 0
    val results =
      if (!needRetry) firstPass
      else firstPass.map { t =>
        if (spreadPct(t) < NoisySpreadPct) t
        else {
          retried += 1
          val again = Timing(t.name, timedRuns(t.name, SparkEntry.queries(t.name), 1))
          if (again.failed) t
          else if (spreadPct(again) < spreadPct(t) ||
            (spreadPct(again) == spreadPct(t) && again.median < t.median)) again
          else t
        }
      }
    val contended = results.count(spreadPct(_) >= NoisySpreadPct) > MaxNoisyQueries

    val ok = results.filterNot(_.failed)
    val total = ok.map(_.median).sum
    val totalMin = ok.map(_.min).sum

    // MEASURED FLOORS (FLOOR.json) — the fixed per-query cost this
    // harness pays before any data is touched, measured in THE SAME
    // SESSION as the query numbers so the 2× methodology's
    // floor-adjustment is data, not narrative:
    //   - batch floor: a 1-row no-scan plan through the same noop-sink
    //     materialisation every benched query uses (job submit + stage
    //     schedule + codegen/session overhead);
    //   - streaming floor: a 1-row file-source AvailableNow run with a
    //     fresh checkpoint through foreachBatch (the machinery every
    //     streaming query re-pays per run: offset log, commit log, batch
    //     planning), with the same warmup/median protocol.
    // DuckDB's analogue of both is microseconds, so at sf0.1 many
    // oracle-paired queries are floor-dominated; the marginal
    // (floor-subtracted) ratio is what projects to 100 TB, and
    // scripts/baseline_table.py quotes it from this artifact.
    val floorBatch = Timing("floor_batch",
      timedRuns("floor_batch", (s, _) => s.range(1).toDF("id"), Warmups))
    // the minimal END-TO-END query: a real (5-row) parquet table through
    // the same ingest + scan + materialise path every benched query
    // takes — file listing, footer decode, scan-stage scheduling. This
    // is the floor a data-touching query cannot go below, and the one
    // the marginal-ratio adjustment uses.
    val floorScan = Timing("floor_scan",
      timedRuns("floor_scan",
        (s, dir) => graft.core.Tables.t(s, dir, "region"), Warmups))
    val floorStream: Timing = {
      val src = graft.core.Scratch.deleteOnExit(
        Files.createTempDirectory("graft_floor_src").toString)
      spark.range(1).toDF("id").coalesce(1)
        .write.mode("overwrite").parquet(s"$src/t")
      def once(): Double = {
        val ckpt = graft.core.Scratch.deleteOnExit(
          Files.createTempDirectory("graft_floor_ckpt").toString)
        val t0 = System.nanoTime()
        val q = spark.readStream
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType))))
          .parquet(s"$src/t")
          .writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        (1 to Warmups).foreach(_ => once())
        Timing("floor_stream", (1 to TimedRuns).map(_ => once()))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] floor_stream failed: ${e.getMessage}")
        Timing("floor_stream", Seq.empty)
      }
    }
    val floorPath = sys.env.getOrElse("SPARK_GRAFT_FLOOR", "FLOOR.json")
    def floorJson(t: Timing): String = {
      val runs = t.runs.map(r => f"$r%.6f").mkString("[", ",", "]")
      s"""{"median_sec": ${f"${t.median}%.6f"}, "min_sec": ${f"${t.min}%.6f"}, "runs_sec": $runs}"""
    }
    val floorOut =
      s"""{
         |  "sf": "$sfDir",
         |  "cpus": $cpus,
         |  "warmups": $Warmups,
         |  "timed_runs": $TimedRuns,
         |  "stat": "median",
         |  "floor_batch": ${floorJson(floorBatch)},
         |  "floor_scan": ${floorJson(floorScan)},
         |  "floor_stream": ${floorJson(floorStream)}
         |}
         |""".stripMargin
    val floorTmp = Paths.get(floorPath + ".tmp")
    Files.write(floorTmp, floorOut.getBytes(StandardCharsets.UTF_8))
    Files.move(floorTmp, Paths.get(floorPath), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)

    // Full-precision detail artifact (committed per round as BENCH_DETAIL_r<N>.json)
    val detail = results.map { t =>
      val runs = t.runs.map(r => f"$r%.6f").mkString("[", ",", "]")
      s"""    "${t.name}": {"median_sec": ${f"${t.median}%.6f"}, "min_sec": ${f"${t.min}%.6f"}, "runs_sec": $runs}"""
    }.mkString(",\n")
    val detailJson =
      s"""{
         |  "sf": "$sfDir",
         |  "cpus": $cpus,
         |  "warmups": $Warmups,
         |  "timed_runs": $TimedRuns,
         |  "stat": "median",
         |  "total_median_sec": ${f"$total%.6f"},
         |  "total_min_sec": ${f"$totalMin%.6f"},
         |  "n_queries": ${results.size},
         |  "n_failed": ${results.size - ok.size},
         |  "noisy_retried": $retried,
         |  "contended_window": $contended,
         |  "queries": {
         |$detail
         |  }
         |}
         |""".stripMargin
    val tmp = Paths.get(detailPath + ".tmp")
    Files.write(tmp, detailJson.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(detailPath), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)

    // Compact final line: short keys ("q01") + 2dp seconds so the
    // driver's ~2 KB tail capture always parses at 124 queries (full
    // 6dp precision lives in the detail file; BASELINE's table prints
    // 2dp). `queries` stays name→seconds (the driver contract);
    // run-to-run noise surfaces in `noisy` — the ≤6 queries with the
    // largest (max-min)/median percentage at ≥30% — so a drifting host
    // is self-evident in the artifact without blowing the tail budget
    // (r7's q21/q82 adjudication needed exactly this). RegistrySpec
    // guards the worst-case line width.
    // adaptive precision: 2dp below 10 s, 1dp to 100 s, integer seconds
    // above — worst-case value width stays 4 chars through 9999 s
    // ("9.99"/"99.9"/"9999"), which is what keeps the 144-query line
    // under the tail budget (a 1dp "100.0" would be the first 5-char
    // value and silently break the width guard's model); micro-queries
    // keep their 10 ms resolution where it matters
    // since r15 the line value CLAMPS at 999 s (3-char worst case — a
    // query past 16 minutes is a stall, and its true median is in the
    // detail file): the 4-char "9999" model was the per-query byte that
    // priced the 165th query out of the tail budget.
    // r16 (186 queries): the r15 line's TYPICAL width already overflowed
    // the capture (sub-10 s queries print 4-char "0.52" 2dp values; the
    // r15 BENCH artifact shows parsed=null — the committed detail file
    // carried the round). Two levers restore a parseable line with
    // headroom: map keys drop the redundant "q" prefix ("01".."186" —
    // full names live in the detail file; −1 byte × every query) and the
    // value ladder flattens to 1dp below 10 s / integer seconds to 98 /
    // clamp "99" (a per-query 99 s median at sf0.1 is a stall; suite
    // total is ~150 s) — worst-case value width is now 3 chars REAL, not
    // just modelled. RegistrySpec guards the new model.
    val qs = results.map { t =>
      // r18 (200 queries): the decimal key model ("1".."200") priced the
      // 200th query at exactly the 2000 B guard — keys are now the query
      // ORDINAL IN BASE 36 ("q197" → "5h"; derivation is one
      // Integer.parseInt(k, 36) away, and full names live in the detail
      // file). 1-2 chars through q1295 — ~127 B back at 200 queries.
      val short = Integer.toString(
        t.name.takeWhile(_ != '_').stripPrefix("q").toInt, 36)
      // boundary: a median in [9.95, 10) would %.1f-print 4-char "10.0",
      // so route it to the integer branch — 3-char worst case holds for
      // the ACTUAL formatted value, not just the pre-rounding magnitude
      val v = if (t.failed) "-1"
        else if (t.median >= 99) "99"
        else if (t.median >= 9.95) f"${t.median}%.0f" else f"${t.median}%.1f"
      "\"" + short + "\":" + v
    }.mkString("{", ",", "}")
    val noisyCount = results.filterNot(_.failed).count(spreadPct(_) >= NoisySpreadPct)
    // min_total/stat/detail-path live ONLY in the detail artifact now:
    // at 136 queries the line hit 1978 B of the driver's ~2 KB tail
    // capture, and those keys are the only droppable bytes — removing
    // them bought ~6 queries of surface headroom under the width guard;
    // at 156 queries the builder-added aux keys shrank
    // (retried→rtry, contended→cont, n_queries→nq, n_failed→nf), at
    // 159 the per-query NOISY MAP collapsed to a COUNT and `sf` to its
    // basename, and at 161 the fully-DERIVABLE aux keys dropped
    // entirely (rtry = detail's noisy_retried; nq = |queries|; nf = the
    // count of -1 values in `queries`) — the per-query spreads are in
    // BENCH_DETAIL.json's runs_sec (committed every round), so the
    // r7-style host-drift adjudication still has its data; the line
    // keeps only the flags that say "go look" ("noisy">0 or "cont").
    // The driver contract keys (metric/value/unit/queries/sf) stay.
    val sfShort = sfDir.split('/').last
    // r17 headroom: at 196 queries the line reads 1965 B of the ~2 KB
    // capture — the "go look" flags now print ONLY when they say go look
    // ("noisy":0 and "cont":false are the overwhelmingly common values
    // and carry no information; absence means the same thing), buying
    // ~24 B ≈ 3 queries of surface before the next recalibration.
    // RegistrySpec's width guard models the flags-present worst case.
    val flags = (if (noisyCount > 0) s""","noisy":$noisyCount""" else "") +
      (if (contended) s""","cont":true""" else "")
    // "kb":36 is the key-schema marker (r18 ADVICE): base-36 ordinal
    // keys silently collide with r17's decimal keys on multi-digit
    // values ("10" = q10 decimal but q36 base-36), so the line declares
    // its key base — longitudinal tooling mixing rounds can dispatch on
    // the marker (absent = decimal, the pre-r18 encoding) instead of
    // misattributing timings with no error.
    println(s"""{"metric":"total_warm_sec","value":${f"$total%.2f"},"unit":"sec","kb":36,"queries":$qs$flags,"sf":"$sfShort"}""")
    spark.stop()
  }
}
