package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Test-only bridge into `private[sql]` session state: exposes whether the
  * CacheManager holds any entries, so specs can prove that iterative ops
  * (graft.ops.Components) release every cache they create — the guarantee
  * a long-lived job server relies on.
  */
object CacheProbe {
  def cacheIsEmpty(spark: SparkSession): Boolean =
    spark.asInstanceOf[ClassicSession].sharedState.cacheManager.isEmpty
}
