package graft

import java.nio.file.Files

import graft.ops.VersionedTarget

/** Retention/GC contract of the versioned parquet targets behind q109
  * (Rewrite) and q132 (Segmented): vacuum deletes only versions strictly
  * older than the newest keepLast commits, so a reader that resolved
  * CURRENT up to keepLast-1 commits ago still reads a complete table —
  * never a half-deleted one.
  */
class VersionedTargetSpec extends SparkSpec {
  import spark.implicits._

  private def df(ids: Long*) =
    ids.map(i => (i, s"row$i")).toDF("id", "payload")

  test("Segmented: commit appends O(batch) segments; reads compose the manifest") {
    val root = Files.createTempDirectory("graft_vt_seg")
    val t = VersionedTarget.Segmented(root)
    assert(t.current(spark).isEmpty, "no version committed yet")
    t.commit(df(1L, 2L), 0L)
    t.commit(df(3L), 1L)
    t.commit(spark.emptyDataset[(Long, String)].toDF("id", "payload"), 2L)
    t.commit(df(4L), 3L)
    assert(VersionedTarget.currentVersion(root).contains("v3"))
    assert(t.committed(3L) && !t.committed(4L))
    val ids = t.current(spark).get.select($"id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 3L, 4L))
    // time travel: any committed version reads its own prefix of segments
    val v1 = t.read(spark, "v1").get.select($"id").collect().map(_.getLong(0)).toSet
    assert(v1 == Set(1L, 2L, 3L))
  }

  test("Segmented vacuum: keeps newest N manifests readable, GCs orphans, " +
      "never touches a retained reader's segments") {
    val root = Files.createTempDirectory("graft_vt_segvac")
    val t = VersionedTarget.Segmented(root)
    (0L to 4L).foreach(b => t.commit(df(b), b))
    // orphan from a crash BEFORE the pointer swap: segment written, no manifest
    df(99L).write.parquet(root.resolve("seg99").toString)
    // a reader resolved CURRENT one commit ago (v3) and still holds it
    val oldPointer = "v3"
    val deleted = t.vacuum(keepLast = 2)
    assert(deleted.toSet == Set("v0", "v1", "v2", "seg99"),
      s"vacuum must drop manifests strictly older than the newest 2 plus " +
        s"unreferenced segments, got $deleted")
    // append-only: every retained manifest still references ALL its
    // segments, so no data segment of v3/v4 may be deleted
    val live = t.read(spark, oldPointer).get.select($"id")
      .collect().map(_.getLong(0)).toSet
    assert(live == Set(0L, 1L, 2L, 3L),
      s"reader holding $oldPointer saw a half-deleted table: $live")
    assert(t.current(spark).get.count() == 5)
    // dropped manifests no longer resolve at all (not partially)
    assert(t.read(spark, "v1").isEmpty)
  }

  test("Segmented compact: folds live segments into one, preserves content, " +
      "and keeps the pre-compaction reader whole until vacuum") {
    val root = Files.createTempDirectory("graft_vt_compact")
    val t = VersionedTarget.Segmented(root)
    (0L to 3L).foreach(b => t.commit(df(b * 10, b * 10 + 1), b))
    val before = t.current(spark).get.orderBy($"id").collect().toSeq
    assert(t.segmentsOf("v3").size == 4, "one segment per commit pre-compaction")
    // a reader resolved CURRENT before the compaction and still holds v3
    assert(t.compact(spark, 4L), "4 live segments must compact")
    // content invariant: the merged segment carries exactly the same rows
    val after = t.current(spark).get.orderBy($"id").collect().toSeq
    assert(after == before, "compaction changed corpus content")
    assert(t.segmentsOf("v4") == Seq("seg4"), "compacted manifest = one segment")
    // bin-packing: collect-sized data folds to ONE part file, not one
    // file per input split (the point of compacting at all)
    val parts = root.resolve("seg4").toFile.listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts == 1, s"expected 1 bin-packed part file, got $parts")
    // the pre-compaction reader's segments are all still on disk
    val v3 = t.read(spark, "v3").get.select($"id").collect().map(_.getLong(0)).toSet
    assert(v3 == before.map(_.getLong(0)).toSet,
      "reader holding v3 lost segments during compaction")
    // vacuum to the compacted version retires the folded segments
    val deleted = t.vacuum(keepLast = 1)
    assert(deleted.toSet == Set("v0", "v1", "v2", "v3", "seg0", "seg1", "seg2", "seg3"),
      s"vacuum after compact must retire the folded segments, got $deleted")
    assert(t.current(spark).get.orderBy($"id").collect().toSeq == before)
    // appends continue on top of the compacted segment
    t.commit(df(100L), 5L)
    assert(t.segmentsOf("v5") == Seq("seg4", "seg5"))
    assert(t.current(spark).get.count() == before.size + 1)
  }

  test("Segmented compact: a crash before the pointer swap leaves CURRENT " +
      "whole and vacuum sweeps the orphaned merged segment") {
    val root = Files.createTempDirectory("graft_vt_compact_crash")
    val t = VersionedTarget.Segmented(root)
    (0L to 2L).foreach(b => t.commit(df(b), b))
    // simulate the crash: the merged segment landed, but neither the
    // manifest nor the pointer moved (compact dies mid-flight)
    t.current(spark).get.write.parquet(root.resolve("seg3").toString)
    assert(VersionedTarget.currentVersion(root).contains("v2"),
      "a half-done compaction must not be visible")
    val before = t.current(spark).get.orderBy($"id").collect().toSeq
    // recovery: vacuum retires the unreferenced orphan; a re-run compact
    // (fresh batchId, per the single-writer epoch contract) succeeds
    val deleted = t.vacuum(keepLast = 3)
    assert(deleted.contains("seg3"), s"orphan merged segment not swept: $deleted")
    assert(t.compact(spark, 4L))
    assert(t.current(spark).get.orderBy($"id").collect().toSeq == before)
  }

  test("Segmented compact: no-op on empty or already-single-segment targets") {
    val root = Files.createTempDirectory("graft_vt_compact_noop")
    val t = VersionedTarget.Segmented(root)
    assert(!t.compact(spark, 1L), "nothing committed: compact must refuse")
    t.commit(df(1L), 0L)
    assert(!t.compact(spark, 1L), "single segment: nothing to fold")
    assert(VersionedTarget.currentVersion(root).contains("v0"),
      "a refused compaction must not move the pointer")
  }

  test("Segmented compact: a stale batchId is refused before it can " +
      "overwrite a live segment") {
    val root = Files.createTempDirectory("graft_vt_compact_stale")
    val t = VersionedTarget.Segmented(root)
    (0L to 2L).foreach(b => t.commit(df(b), b))
    val before = t.current(spark).get.orderBy($"id").collect().toSeq
    intercept[IllegalArgumentException] { t.compact(spark, 1L) }: Unit
    assert(VersionedTarget.currentVersion(root).contains("v2"),
      "refused compact must not move the pointer")
    assert(t.current(spark).get.orderBy($"id").collect().toSeq == before,
      "refused compact corrupted live data")
    // a redelivered compact (same id as its own committed version, now a
    // single-segment manifest) stays a harmless no-op
    assert(t.compact(spark, 3L))
    assert(!t.compact(spark, 3L), "redelivered compact must be a no-op")
  }

  test("property: random commit/compact/vacuum interleavings always read as " +
      "the union of committed batches") {
    import org.scalacheck.Gen
    // op stream: 1 = commit (next batch of fresh ids), 2 = compact,
    // 3 = vacuum(2) — the three lifecycle verbs in arbitrary order
    val genOps = Gen.listOfN(7, Gen.chooseNum(1, 3))
    val cases = (1 to 8).flatMap(_ => genOps.sample).take(4)
    for (ops <- cases) {
      val root = Files.createTempDirectory("graft_vt_prop")
      val t = VersionedTarget.Segmented(root)
      var epoch = 0L
      var committed = Set.empty[Long]
      ops.foreach {
        case 1 =>
          val ids = Seq(epoch * 10, epoch * 10 + 1)
          t.commit(df(ids: _*), epoch); committed ++= ids; epoch += 1
        case 2 =>
          if (t.compact(spark, epoch)) epoch += 1
        case _ =>
          if (VersionedTarget.currentVersion(root).isDefined) t.vacuum(2): Unit
      }
      val read = t.current(spark)
        .map(_.select($"id").collect().map(_.getLong(0)).toSet)
        .getOrElse(Set.empty[Long])
      assert(read == committed,
        s"ops $ops: read $read but committed $committed")
    }
  }

  test("Rewrite: commit swaps atomically; vacuum deletes only strictly-older versions") {
    val root = Files.createTempDirectory("graft_vt_rw")
    val t = VersionedTarget.Rewrite(root)
    assert(t.current(spark).isEmpty)
    (0L to 4L).foreach(b => t.commit(df(0L to b: _*), b))
    assert(t.committed(4L) && !t.committed(2L))
    val deleted = t.vacuum(keepLast = 2)
    assert(deleted == Seq("v0", "v1", "v2"), s"got $deleted")
    // reader that resolved CURRENT one commit ago still reads v3 whole
    assert(t.read(spark, "v3").select($"id").collect().map(_.getLong(0)).toSet ==
      (0L to 3L).toSet)
    assert(t.current(spark).get.count() == 5)
    assert(!Files.exists(root.resolve("v2")), "v2 must be gone entirely")
  }

  test("Segmented: a crash between data write and pointer swap is healed by " +
      "redelivery; vacuum sweeps what the crash orphaned") {
    val root = Files.createTempDirectory("graft_vt_crash")
    val t = VersionedTarget.Segmented(root)
    t.commit(df(1L), 0L)
    // simulate batch 1 crashing AFTER writing its segment and manifest but
    // BEFORE the atomic pointer swap: garbage data, unreferenced by CURRENT
    df(99L).write.parquet(root.resolve("seg1").toString)
    Files.write(root.resolve("v1"), "seg0\nseg1".getBytes("UTF-8"))
    assert(!t.committed(1L), "pointer never moved — batch 1 must not read as applied")
    assert(t.current(spark).get.select($"id").collect().map(_.getLong(0)).toSet ==
      Set(1L), "readers must still see only v0")
    // streaming redelivers batch 1; the re-run overwrites the partial
    // segment + manifest and completes the swap
    t.commit(df(2L), 1L)
    assert(t.committed(1L))
    assert(t.current(spark).get.select($"id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L), "redelivered commit must replace the crashed attempt's data")
    // and if the crashed attempt is instead ABANDONED (no redelivery),
    // vacuum sweeps its orphan segment once it falls out of retention
    df(98L).write.parquet(root.resolve("seg7").toString) // orphan, no manifest
    val deleted = t.vacuum(keepLast = 2)
    assert(deleted.contains("seg7"), s"orphan segment not swept: $deleted")
  }

  test("vacuum refuses keepLast < 1 (would delete CURRENT's own version)") {
    val root = Files.createTempDirectory("graft_vt_guard")
    val t = VersionedTarget.Segmented(root)
    t.commit(df(1L), 0L)
    intercept[IllegalArgumentException](t.vacuum(0))
    intercept[IllegalArgumentException](VersionedTarget.Rewrite(root).vacuum(0))
  }
}
