package graft.core

/** Session-scoped scratch directories (q107 z-order layouts, q109 CDC
  * table versions): application-id-suffixed paths keep concurrent
  * processes apart, and registering them here deletes them when the JVM
  * exits — so repeated runs stop accumulating parquet dirs in /tmp. The
  * frames a query returns read these dirs lazily, so deletion can only
  * happen after the process is done with them: JVM exit is the earliest
  * safe point a query entry can guarantee.
  */
object Scratch {
  private val registered = scala.collection.mutable.LinkedHashSet[String]()
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.synchronized(registered.foreach(p => rm(new java.io.File(p))))))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def deleteOnExit(path: String): String = {
    hookInstalled
    registered.synchronized(registered += path)
    path
  }
}
