package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization (gaps-and-islands) — the batch twin of the
  * streaming `session_window` (Q48): assign a session id per key where a
  * gap above `gapSeconds` starts a new session.
  *
  * One shuffle (by key) + one in-partition sort — same cost shape as any
  * window op; no state store needed in batch.
  */
object Sessionize {

  /** Adds `sessionCol` (per-key session ordinal, 1-based) to `df`. */
  def byGap(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
            sessionCol: String = "session_id"): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts)
    val newSession = when(
      lag(ts, 1).over(w).isNull ||
        unix_micros(ts) - unix_micros(lag(ts, 1).over(w)) > gapSeconds * 1000000L,
      1L).otherwise(0L)
    df.withColumn(sessionCol,
      sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
