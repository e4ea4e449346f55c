package graft.tools

import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Test fixture main: acquire the [[graft.ops.VersionedTarget]] pointer
  * lock of a target root FROM A SEPARATE PROCESS and hold it for a given
  * time. The per-root JVM monitor serializes same-JVM writers before the
  * OS lock is ever contended, so every in-suite test exercises only the
  * monitor; this main is how `VersionedTargetSpec` proves the
  * cross-process half actually excludes (a second writer JVM — a
  * maintenance job on another node with the same mounted store — must
  * block on the manifest+swap transaction, not interleave with it).
  *
  * Usage: LockHold <rootDir> <holdMillis>. Prints `LOCKED` once the lock
  * is held (the spec waits for that line), sleeps, releases, exits 0.
  * Deliberately Spark-free: a bare JVM start is ~100 ms, so the spec
  * stays fast.
  */
object LockHold {
  def main(args: Array[String]): Unit = {
    val root = Paths.get(args(0))
    val holdMs = args(1).toLong
    val ch = FileChannel.open(root.resolve(".lock"),
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    val lock = ch.lock()
    println("LOCKED")
    System.out.flush()
    Thread.sleep(holdMs)
    lock.release()
    ch.close()
  }
}
