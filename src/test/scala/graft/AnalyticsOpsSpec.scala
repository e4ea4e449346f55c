package graft

import org.apache.spark.sql.functions._
import graft.queries.AnalyticsOps

/** Round-6 batch-2 operators (q110–q114): invariants beyond the hash
  * gate — cosine features are bounded, CUBE covers all grouping levels
  * with consistent totals, the gap-filled grid is complete and
  * count-preserving, OHLC bars are internally ordered, and the snapshot
  * diff's class accounting matches the change-set derivation.
  */
class AnalyticsOpsSpec extends SparkSpec {

  test("q110: cosines bounded, one row per vector, margin = own - best_other") {
    import spark.implicits._
    val out = AnalyticsOps.q110(spark, sfDir).cache()
    try {
      assert(out.count() > 0)
      assert(out.groupBy($"vec_id").count().filter($"count" > 1).isEmpty,
        "vector scored more than once")
      assert(out.filter(abs($"cos_own6") > 1.000001 || abs($"best_other6") > 1.000001).isEmpty,
        "cosine outside [-1, 1]")
      assert(out.filter(abs($"margin6" - ($"cos_own6" - $"best_other6")) > 1e-6).isEmpty,
        "margin is not own - best_other")
    } finally out.unpersist(): Unit
  }

  test("q111: CUBE emits all four grouping levels and the grand total matches") {
    import spark.implicits._
    val out = AnalyticsOps.q111(spark, sfDir).cache()
    try {
      val gids = out.select($"gid").distinct().as[Long].collect().toSet
      assert(gids == Set(0L, 1L, 2L, 3L), s"missing CUBE levels: $gids")
      val total = graft.core.Tables.t(spark, sfDir, "lineitem").count()
      val grand = out.filter($"gid" === 3L).select($"n").as[Long].head()
      assert(grand == total, s"grand total $grand != table count $total")
    } finally out.unpersist(): Unit
  }

  test("q112: grid is complete per type and zero-filling preserves event counts") {
    import spark.implicits._
    val out = AnalyticsOps.q112(spark, sfDir).cache()
    try {
      val perType = out.groupBy($"event_type")
        .agg(count(lit(1)).as("rows"),
          ((max($"bucket") - min($"bucket")) / 300 + 1).as("want"))
      assert(perType.filter($"rows" =!= $"want").isEmpty,
        "grid has holes — gap fill incomplete")
      val filled = out.agg(sum($"n")).as[Long].head()
      val raw = graft.core.Tables.t(spark, sfDir, "events").count()
      assert(filled == raw, s"zero-fill changed total event count: $filled != $raw")
    } finally out.unpersist(): Unit
  }

  test("q113: OHLC bars are internally consistent (low <= open/close <= high)") {
    import spark.implicits._
    val out = AnalyticsOps.q113(spark, sfDir).cache()
    try {
      assert(out.count() > 0)
      assert(out.filter($"low" > $"high").isEmpty, "low above high")
      assert(out.filter($"open" < $"low" || $"open" > $"high").isEmpty, "open outside bar")
      assert(out.filter($"close" < $"low" || $"close" > $"high").isEmpty, "close outside bar")
    } finally out.unpersist(): Unit
  }

  test("q114: diff class accounting matches the q103 change-set derivation") {
    import spark.implicits._
    val out = AnalyticsOps.q114(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val o = graft.core.Tables.t(spark, sfDir, "orders").cache()
    try {
      val nUpd = o.filter($"o_orderkey" % 10 === 0).count()
      val nDel = o.filter($"o_orderkey" % 10 === 1).count()
      val nIns = o.filter($"o_orderkey" % 100 === 2).count()
      val nAll = o.count()
      assert(out.getOrElse("added", 0L) == nIns, s"added ${out.get("added")} != inserts $nIns")
      assert(out.getOrElse("removed", 0L) == nDel, s"removed ${out.get("removed")} != deletes $nDel")
      assert(out.getOrElse("changed", 0L) == nUpd, s"changed ${out.get("changed")} != updates $nUpd")
      assert(out.getOrElse("unchanged", 0L) == nAll - nUpd - nDel,
        "unchanged must be the untouched remainder")
    } finally o.unpersist(): Unit
  }
}
