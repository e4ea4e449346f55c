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
}
