package graft.core

import org.apache.spark.sql.DataFrame

/** Ownership registry for caches created INSIDE a query entry whose
  * returned frame still reads them (q100/q101/q102's single-tokenize
  * corpus caches, q94's labels frame): a lazy DataFrame can't unpersist
  * its own inputs before the caller consumes it, so the consumer —
  * Verify / Bench after each query, a job-server task on completion —
  * calls [[releaseAll]] once the action is done. Keeps the
  * tokenize-once plans (persist is what stops Catalyst re-running the
  * explode per join branch) without leaving corpus-sized cache entries
  * resident for the session. PipelineOpsSpec proves the CacheManager is
  * empty after a run + releaseAll.
  */
object CacheScope {
  private val live = scala.collection.mutable.Buffer[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def track(df: DataFrame): DataFrame = synchronized { live += df.persist(); df }

  /** Register an already-persisted frame (e.g. one handed back by
    * `Components.clustersWithSize`, whose contract is caller-releases).
    */
  def adopt(df: DataFrame): DataFrame = synchronized { live += df; df }

  /** Unpersist every tracked frame. Safe to call at any point the caller
    * has finished consuming the frames that read them; blocking=false,
    * so in-flight jobs are unaffected.
    */
  def releaseAll(): Unit = synchronized {
    live.foreach(_.unpersist(): Unit)
    live.clear()
  }
}
