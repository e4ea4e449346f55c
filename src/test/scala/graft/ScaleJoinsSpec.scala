package graft

import org.apache.spark.sql.functions._
import graft.ops.ScaleJoins

/** Salting preserves join semantics; bucketed layout kills the shuffle. */
class ScaleJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // hot key: 90% of left rows share key 1
    val left = ((1 to 900).map(i => (1L, s"l$i")) ++ (1 to 100).map(i => (i.toLong + 1, s"x$i")))
      .toDF("k", "lv")
    val right = (1 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    val salted = ScaleJoins.saltedInnerJoin(left, right, "k", salts = 8)
      .select("k", "lv", "rv").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 900 + 49) // hot key ⋈ r1 + distinct tail keys
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, i * 3)).toDF("k", "vb")
    ScaleJoins.writeBucketed(a, "bkt_a", "k", 4)
    ScaleJoins.writeBucketed(b, "bkt_b", "k", 4)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), Seq("k"))
    // force SMJ so the test asserts bucket co-location, not broadcast
    val smj = joined.hint("merge", "bkt_b")
    val plan = smj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(smj.count() == 1000)
    spark.sql("DROP TABLE IF EXISTS bkt_a")
    spark.sql("DROP TABLE IF EXISTS bkt_b")
  }

  test("ANALYZE feeds the CBO: rowCount lands in plan stats and stats pick the broadcast side") {
    val big = (1 to 20000).map(i => (i.toLong, "x" * 60)).toDF("k", "pad")
    val small = (1 to 300).map(i => (i.toLong, i.toString)).toDF("k", "sv")
    ScaleJoins.writeBucketed(big, "cbo_big", "k", 4)
    small.write.mode("overwrite").format("parquet").saveAsTable("cbo_small")
    ScaleJoins.analyzeTable(spark, "cbo_big", Seq("k"))
    ScaleJoins.analyzeTable(spark, "cbo_small", Seq("k"))
    val confs = Seq(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "true",
      // tight threshold: only a STATS-size estimate of the 300-row side
      // fits under it; the 20k-row side must stay the probe side
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString)
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // ANALYZE row count surfaces in the optimized plan's statistics
      val rc = spark.table("cbo_small").queryExecution.optimizedPlan.stats.rowCount
      assert(rc.contains(BigInt(300)), s"rowCount from ANALYZE missing: $rc")
      // stats-driven broadcast: small analyzed side broadcasts, big doesn't
      val joined = spark.table("cbo_big").join(spark.table("cbo_small"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), s"no stats-driven broadcast:\n$plan")
      assert(joined.count() == 300)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
      spark.sql("DROP TABLE IF EXISTS cbo_big")
      spark.sql("DROP TABLE IF EXISTS cbo_small")
    }
  }
}
