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
  private val current =
    new ThreadLocal[scala.collection.mutable.LinkedHashSet[String]]
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      registered.synchronized(registered.foreach(p => rm(new java.io.File(p))))))

  private def rm(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
    f.delete(): Unit
  }

  /** Register `path` for recursive deletion — at JVM exit, or (inside a
    * [[taskScoped]] block that fails) immediately. Returns it.
    */
  def deleteOnExit(path: String): String = {
    hookInstalled
    val scope = current.get()
    if (scope ne null) scope.synchronized(scope += path): Unit
    else registered.synchronized(registered += path): Unit
    path
  }

  /** Run `body` with a task-local scratch scope (JobRunner wraps each
    * task in one). Paths registered inside are deleted IMMEDIATELY if the
    * body throws — a failed or cancelled task's scratch output is never
    * consumed, so waiting for JVM exit would just leak disk for the
    * process lifetime — and promoted to the JVM-exit registry on success
    * (the frames a completing task returns read its scratch lazily, so
    * exit remains the earliest safe deletion point). Nests: the previous
    * binding is restored afterwards.
    */
  def taskScoped[A](body: => A): A = {
    val outer = current.get()
    val mine = scala.collection.mutable.LinkedHashSet[String]()
    current.set(mine)
    try {
      val result = body
      registered.synchronized(registered ++= mine): Unit
      result
    } catch {
      case e: Throwable =>
        mine.foreach(p => rm(new java.io.File(p)))
        throw e
    } finally current.set(outer)
  }
}
