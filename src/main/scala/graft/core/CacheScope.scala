package graft.core

import org.apache.spark.sql.DataFrame

/** Ownership registry for caches created INSIDE a query entry whose
  * returned frame still reads them (q100/q101/q102's single-tokenize
  * corpus caches, q94's labels frame): a lazy DataFrame can't unpersist
  * its own inputs before the caller consumes it, so the consumer calls
  * release once the action is done. Keeps the tokenize-once plans
  * (persist is what stops Catalyst re-running the explode per join
  * branch) without leaving corpus-sized cache entries resident for the
  * session.
  *
  * SCOPING: registrations land in the CURRENT thread's open [[scoped]]
  * block if one is active, else in the process-global scope. That makes
  * the registry safe under concurrent consumers — the job server admits
  * up to 8 tasks at once (JobRunner wraps each task body in [[scoped]],
  * so one task's release can never unpersist another task's live
  * caches), while the sequential consumers (Verify / Bench, which run
  * one query per [[releaseAll]]) keep using the global scope unchanged.
  * Query entries build their whole DataFrame on the consumer's thread,
  * so thread-locality is exactly query-locality here.
  *
  * PipelineOpsSpec proves the CacheManager is empty after a run +
  * releaseAll; ExecLayerSpec proves two concurrent cache-owning tasks
  * don't cross-release.
  */
object CacheScope {

  private final class Scope {
    private val live = scala.collection.mutable.Buffer[DataFrame]()
    def add(df: DataFrame): Unit = synchronized { live += df: Unit }
    def release(): Unit = synchronized {
      live.foreach(_.unpersist(): Unit)
      live.clear()
    }
  }

  private val global = new Scope
  private val current = new ThreadLocal[Scope]

  private def ambient: Scope = {
    val s = current.get()
    if (s ne null) s else global
  }

  /** Persist `df` and register it with the ambient scope. */
  def track(df: DataFrame): DataFrame = { df.persist(); ambient.add(df); df }

  /** Register an already-persisted frame (e.g. one handed back by
    * `Components.clustersWithSize`, whose contract is caller-releases).
    */
  def adopt(df: DataFrame): DataFrame = { ambient.add(df); df }

  /** Unpersist every frame tracked in the ambient scope (the thread's
    * open [[scoped]] block, else the global scope). Safe to call at any
    * point the caller has finished consuming the frames that read them;
    * blocking=false, so in-flight jobs are unaffected.
    */
  def releaseAll(): Unit = ambient.release()

  /** Run `body` with a fresh scope bound to this thread; every frame the
    * body tracks/adopts is released on exit (normal or exceptional),
    * touching nothing registered by other threads. Nests: the previous
    * binding (outer scope or global) is restored afterwards.
    */
  def scoped[A](body: => A): A = {
    val outer = current.get()
    val s = new Scope
    current.set(s)
    try body
    finally {
      s.release()
      if (outer ne null) current.set(outer) else current.remove()
    }
  }
}
