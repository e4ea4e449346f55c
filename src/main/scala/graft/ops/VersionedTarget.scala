package graft.ops

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned parquet targets with an atomic CURRENT pointer — the
  * machinery behind the streaming MERGE sinks (q109, q132) and their
  * retention/GC, factored so both queries share one committed/commit/
  * vacuum implementation and the specs can drive it batch-by-batch.
  *
  * Two physical shapes, chosen by what the workload's merge actually
  * changes (mirrors the reference's durable-state split between
  * append-only run logs and mutated status rows,
  * /root/reference/lib/fossa/control/process.py vs views.py):
  *
  *   - [[VersionedTarget.Segmented]] — APPEND-ONLY merges (q132:
  *     survivors are disjoint new doc_ids per batch, existing rows never
  *     change). A version is a tiny MANIFEST file listing the live
  *     segment dirs; committing batch b writes ONLY that batch's rows
  *     into `seg<b>/` and a new manifest = previous manifest + seg<b>.
  *     Per-batch I/O is O(batch), not O(corpus) — the Delta/Iceberg
  *     MERGE-append shape.
  *   - [[VersionedTarget.Rewrite]] — merges that UPDATE existing keys
  *     (q109: CDC upsert). Without a table format that can rewrite
  *     individual files, a full new version dir per batch is inherent;
  *     each version is the whole table.
  *
  * Shared contract (both shapes):
  *   - commit(df, b) writes the version's data, then atomically swaps
  *     CURRENT to `v<b>` (tmp file + ATOMIC_MOVE) — readers never see a
  *     half-written version.
  *   - committed(b) is the redelivery guard: a crash AFTER the pointer
  *     swap but BEFORE the streaming checkpoint commit redelivers batch
  *     b; the pointer already naming v<b> means the merge is durable —
  *     skip, don't re-apply (end-to-end exactly-once). A crash BEFORE
  *     the swap leaves orphan files that the redelivered commit
  *     overwrites and vacuum eventually removes.
  *   - vacuum(keepLast) deletes versions STRICTLY OLDER than the newest
  *     `keepLast` committed versions (plus any uncommitted orphans from
  *     pre-swap crashes). Every retained version stays fully readable,
  *     so a reader that resolved CURRENT up to keepLast-1 commits ago
  *     never sees a half-deleted table; deletion order (manifest before
  *     its now-unreferenced segments) keeps even a mid-vacuum crash
  *     consistent.
  */
object VersionedTarget {

  /** Default keep-last-N for the streaming merge paths (q109/q132): deep
    * enough that any reader that resolved CURRENT during the last several
    * commits still reads a complete table, shallow enough that the
    * rewrite target holds a bounded number of full copies.
    */
  val DefaultRetain = 8

  private[ops] def pointerOf(root: Path): Path = root.resolve("CURRENT")

  /** The committed version name (`v<batchId>`) behind CURRENT, if any. */
  def currentVersion(root: Path): Option[String] = {
    val p = pointerOf(root)
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), "UTF-8").trim)
    else None
  }

  /** Redelivery guard: true iff CURRENT already names `v<batchId>`. */
  def committed(root: Path, batchId: Long): Boolean =
    currentVersion(root).contains(s"v$batchId")

  /** Atomically repoint CURRENT at `v<batchId>` (tmp + ATOMIC_MOVE). */
  private[ops] def swapPointer(root: Path, batchId: Long): Unit = {
    val tmp = root.resolve(s".CURRENT-$batchId.tmp")
    Files.write(tmp, s"v$batchId".getBytes("UTF-8"))
    Files.move(tmp, pointerOf(root), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE): Unit
  }

  private def batchIdOf(version: String): Long = version.stripPrefix("v").toLong

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rmTree)
    f.delete(): Unit
  }

  private def dirBytes(f: java.io.File): Long =
    if (!f.exists()) 0L
    else if (f.isFile) f.length()
    else Option(f.listFiles()).toSeq.flatten.map(dirBytes).sum

  /** Append-only target: version = manifest FILE `v<b>` listing live
    * segment dir names (one per line, commit order); data lives in
    * immutable `seg<b>/` parquet dirs holding ONLY batch b's rows.
    */
  final case class Segmented(root: Path) {

    def committed(batchId: Long): Boolean = VersionedTarget.committed(root, batchId)

    /** Segment dir names listed by manifest `version` (commit order). */
    def segmentsOf(version: String): Seq[String] = {
      val m = root.resolve(version)
      if (Files.exists(m))
        new String(Files.readAllBytes(m), "UTF-8").linesIterator
          .map(_.trim).filter(_.nonEmpty).toSeq
      else Seq.empty
    }

    /** Commit batch `batchId`: write ONLY `rows` into `seg<batchId>/`,
      * write manifest v<batchId> = previous live segments + the new one,
      * atomically swap CURRENT. O(batch) data I/O; the manifest is bytes.
      * An empty batch still commits (empty parquet segment) so the
      * pointer advances and redelivery stays detectable.
      */
    def commit(rows: DataFrame, batchId: Long): Unit = {
      val seg = s"seg$batchId"
      rows.write.mode("overwrite").parquet(root.resolve(seg).toString)
      val live = currentVersion(root).map(segmentsOf).getOrElse(Seq.empty) :+ seg
      val mTmp = root.resolve(s".v$batchId.tmp")
      Files.write(mTmp, live.mkString("\n").getBytes("UTF-8"))
      Files.move(mTmp, root.resolve(s"v$batchId"),
        StandardCopyOption.REPLACE_EXISTING): Unit
      swapPointer(root, batchId)
    }

    /** Compact every live segment into ONE merged segment committed as
      * version `v<batchId>` (manifest = just `seg<batchId>`). Append-only
      * commits accumulate one segment per micro-batch; each adds a file
      * footer + task to every downstream scan, so a 100 TB target fed by
      * small batches eventually pays more in per-file overhead than in
      * data. Compaction is the amortised counter-move (Delta OPTIMIZE /
      * Iceberg rewrite_data_files): O(live corpus) I/O ONCE, scheduled
      * off the ingest path, after which scans touch one segment again.
      *
      * Old manifests still reference the old segments, which stay on disk
      * until [[vacuum]] drops those manifests — a reader that resolved
      * CURRENT before the compaction keeps reading its complete version.
      * `batchId` must exceed every committed batch id (manifests sort by
      * id); the streaming caller's epoch counter satisfies this.
      * No-op (returns false) when nothing has committed yet or the live
      * manifest already holds a single segment.
      *
      * SINGLE-WRITER, like [[commit]]: both read CURRENT and then swap
      * it, so a compact racing a concurrent commit would resurrect
      * whichever manifest list it read first (classic lost update).
      * The streaming sink serializes them by construction (foreachBatch
      * runs one batch at a time — schedule compaction inside it, or
      * between restarts); a crash between the segment write and the
      * pointer swap leaves CURRENT untouched and an orphan `seg<b>` that
      * [[vacuum]] sweeps (same recovery story as a pre-swap commit
      * crash).
      */
    def compact(s: SparkSession, batchId: Long,
                targetFileBytes: Long = 128L << 20): Boolean =
      currentVersion(root) match {
        case Some(v) if segmentsOf(v).lengthCompare(1) > 0 =>
          // enforce the epoch contract instead of trusting the caller: a
          // stale batchId would OVERWRITE the live seg<batchId> in place
          // (destroying committed data) and write a manifest that sorts
          // before the current one, confusing vacuum's retention order
          require(batchId > batchIdOf(v),
            s"compact batchId v$batchId must exceed the committed $v")
          val segNames = segmentsOf(v)
          val segs = segNames.map(root.resolve(_).toString)
          val seg = s"seg$batchId"
          // Bin-pack the fold: without it the merged write inherits one
          // task (= one output file) per input split, and a target fed by
          // small batches would fold N tiny files into N tiny files. Size
          // the output off the live segments' actual bytes — the same
          // ceil(bytes/target) rule as the q131 table compaction.
          val bytes = segNames.map(n => dirBytes(root.resolve(n).toFile)).sum
          val nFiles =
            math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
          // shuffle-free rewrite: scan the live segments, coalesce, write
          s.read.parquet(segs: _*).coalesce(nFiles).write.mode("overwrite")
            .parquet(root.resolve(seg).toString)
          val mTmp = root.resolve(s".v$batchId.tmp")
          Files.write(mTmp, seg.getBytes("UTF-8"))
          Files.move(mTmp, root.resolve(s"v$batchId"),
            StandardCopyOption.REPLACE_EXISTING): Unit
          swapPointer(root, batchId)
          true
        case _ => false
      }

    /** The live table at `version`: multi-path parquet scan over its
      * segments. Empty-manifest versions read as None (no schema to give).
      */
    def read(s: SparkSession, version: String): Option[DataFrame] = {
      val segs = segmentsOf(version).map(root.resolve(_).toString)
      if (segs.isEmpty) None else Some(s.read.parquet(segs: _*))
    }

    /** The live table behind CURRENT, if any version has committed. */
    def current(s: SparkSession): Option[DataFrame] =
      currentVersion(root).flatMap(read(s, _))

    /** Keep the newest `keepLast` committed manifests; delete manifests
      * strictly older, then segments no retained manifest references
      * (orphans from pre-swap crashes included). Returns deleted names.
      */
    def vacuum(keepLast: Int): Seq[String] = {
      require(keepLast >= 1, "must retain at least the current version")
      val manifests = Files.list(root).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d+")).toSeq.sortBy(batchIdOf)
      val retained = manifests.takeRight(keepLast)
      val dropManifests = manifests.dropRight(keepLast)
      val liveSegs = retained.flatMap(segmentsOf).toSet
      // manifests first: once a manifest is gone no reader can resolve
      // it, so deleting its now-unreferenced segments can't strand one
      dropManifests.foreach(m => Files.deleteIfExists(root.resolve(m)): Unit)
      val dropSegs = Files.list(root).iterator().asScala
        .map(_.getFileName.toString)
        .filter(n => n.matches("seg\\d+") && !liveSegs.contains(n)).toSeq
      dropSegs.foreach(sg => rmTree(root.resolve(sg).toFile))
      dropManifests ++ dropSegs
    }
  }

  /** Full-rewrite target: version = parquet dir `v<b>` holding the WHOLE
    * table — inherent when the merge updates existing keys (CDC).
    */
  final case class Rewrite(root: Path) {

    def committed(batchId: Long): Boolean = VersionedTarget.committed(root, batchId)

    /** Commit batch `batchId`: write the merged table into `v<batchId>/`,
      * atomically swap CURRENT.
      */
    def commit(table: DataFrame, batchId: Long): Unit = {
      table.write.mode("overwrite").parquet(root.resolve(s"v$batchId").toString)
      swapPointer(root, batchId)
    }

    def read(s: SparkSession, version: String): DataFrame =
      s.read.parquet(root.resolve(version).toString)

    def current(s: SparkSession): Option[DataFrame] =
      currentVersion(root).map(read(s, _))

    /** Keep the newest `keepLast` version dirs; delete strictly older
      * ones whole (a reader on any retained version is untouched).
      * Returns deleted names.
      */
    def vacuum(keepLast: Int): Seq[String] = {
      require(keepLast >= 1, "must retain at least the current version")
      val versions = Files.list(root).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.matches("v\\d+")).toSeq.sortBy(batchIdOf)
      val drop = versions.dropRight(keepLast)
      drop.foreach(v => rmTree(root.resolve(v).toFile))
      drop
    }
  }
}
