package graft

import org.apache.spark.sql.functions._
import graft.queries.BehaviorOps

/** Round-6 batch-3 operators (q115–q117): funnel stages partition the
  * user base, cohort offsets stay in range with day-0 present for every
  * cohort, and the weighted sample is length-biased relative to a
  * uniform draw.
  */
class BehaviorOpsSpec extends SparkSpec {

  test("q115: funnel stages partition all users; deeper stages never gain users") {
    import spark.implicits._
    val out = BehaviorOps.q115(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val users = graft.core.Tables.t(spark, sfDir, "events")
      .select($"user_id").distinct().count()
    assert(out.values.sum == users, "funnel stages must partition the user base")
    assert(out.keySet.subsetOf(Set(0L, 1L, 2L, 3L)), s"unexpected stages: ${out.keySet}")
    // cumulative: users reaching stage >= k never increases with k
    val reach = (0 to 3).map(k => (k to 3).map(j => out.getOrElse(j.toLong, 0L)).sum)
    assert(reach.zip(reach.tail).forall { case (a, b) => a >= b },
      s"funnel reach must be non-increasing: $reach")
  }

  test("q116: offsets are 0..7 and every cohort has a day-0 row counting itself") {
    import spark.implicits._
    val out = BehaviorOps.q116(spark, sfDir).cache()
    try {
      assert(out.filter($"day_offset" < 0 || $"day_offset" > 7).isEmpty)
      val cohorts = out.select($"cohort").distinct().count()
      val day0 = out.filter($"day_offset" === 0).count()
      assert(day0 == cohorts, "every cohort must have a day-0 row")
    } finally out.unpersist(): Unit
  }

  test("q118: band counts partition each language and quantiles are ordered") {
    import spark.implicits._
    val out = BehaviorOps.q118(spark, sfDir).cache()
    try {
      assert(out.filter($"p25_6" > $"p50_6" || $"p50_6" > $"p75_6").isEmpty,
        "quantiles out of order")
      val sums = out.select($"lang", ($"n_q1" + $"n_q2" + $"n_q3" + $"n_q4").as("tot"))
      val counts = graft.core.Tables.t(spark, sfDir, "documents")
        .groupBy($"lang").agg(count(lit(1)).as("cnt"))
      assert(sums.join(counts, "lang").filter($"tot" =!= $"cnt").isEmpty,
        "bands must partition each language's documents")
    } finally out.unpersist(): Unit
  }

  test("q119: full outer = q70 inner matches plus null rows on both sides") {
    import spark.implicits._
    val out = graft.queries.StreamingQueries.q119(spark, sfDir).cache()
    try {
      val matched = out.filter($"view_id".isNotNull && $"buy_id".isNotNull).count()
      val inner = graft.queries.StreamingQueries.q70(spark, sfDir).count()
      assert(matched == inner, s"full-outer matched rows $matched != inner join $inner")
      assert(out.filter($"view_id".isNull && $"buy_id".isNull).isEmpty,
        "a row with both sides NULL is impossible")
      val dupNullBuys = out.filter($"view_id".isNull)
        .groupBy($"buy_id").count().filter($"count" > 1)
      assert(dupNullBuys.isEmpty, "an unmatched purchase emitted twice")
    } finally out.unpersist(): Unit
  }

  test("q117: weighted sample is length-biased vs the corpus mean") {
    import spark.implicits._
    val out = BehaviorOps.q117(spark, sfDir).cache()
    try {
      assert(out.count() == 200)
      val sampleMean = out.agg(avg($"n_chars")).as[Double].head()
      val corpusMean = graft.core.Tables.t(spark, sfDir, "documents")
        .filter($"n_chars" > 0).agg(avg($"n_chars")).as[Double].head()
      assert(sampleMean > corpusMean,
        f"length-weighted sample mean $sampleMean%.1f should exceed corpus mean $corpusMean%.1f")
    } finally out.unpersist(): Unit
  }

  test("q123 grouped approx bands track the exact q118 twin per language") {
    val exact = BehaviorOps.q118(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = BehaviorOps.q123(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(exact.keySet == approx.keySet, "language sets differ")
    val langVals = graft.core.Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("n_chars").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (l, rs) => l -> rs.map(_.getDouble(1)).toSet }
    approx.foreach { case (lang, a) =>
      val e = exact(lang)
      // quantiles monotone, and each approx threshold is an ACTUAL data
      // value of the group (the sketch returns order statistics — unlike
      // the exact twin's interpolation, whose VALUE can sit far from any
      // rank-neighbour in a small sparse group, so value-distance is not
      // the invariant; the rank-based band counts below are)
      val (p25, p50, p75) = (a.getAs[Double]("p25_6"),
        a.getAs[Double]("p50_6"), a.getAs[Double]("p75_6"))
      assert(p25 <= p50 && p50 <= p75, s"$lang: approx quantiles not monotone")
      Seq(p25, p50, p75).foreach { v =>
        assert(langVals(lang).contains(v),
          s"$lang: approx quantile $v is not a data value of the group")
      }
      // bands partition the group, and each band count stays within 10%
      // of the group size from the exact twin's count
      val bandCols = Seq("n_q1", "n_q2", "n_q3", "n_q4")
      val total = bandCols.map(e.getAs[Long](_)).sum
      assert(bandCols.map(a.getAs[Long](_)).sum == total,
        s"$lang: approx bands do not partition the group")
      bandCols.foreach { c =>
        assert(math.abs(a.getAs[Long](c) - e.getAs[Long](c)) <= total * 0.10,
          s"$lang/$c: band population ${a.getAs[Long](c)} vs exact ${e.getAs[Long](c)}")
      }
    }
  }
}
