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

  test("AQE splits a runtime-detected skewed partition in a sort-merge join") {
    // the OTHER half of the skew story: saltedInnerJoin is the explicit
    // tool for a KNOWN hot key; AQE's skew-join handles the one the
    // planner discovers at runtime. Thresholds tightened so the ~1 MB hot
    // partition counts as skewed at test scale.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 30k rows of ~64B on the hot key + a 3k-row spread tail
      val left = spark.range(30000).select(lit(1L).as("k"),
          concat(lit("x" * 56), col("id")).as("pad"))
        .union(spark.range(3000).select((col("id") % 100 + 2).as("k"),
          col("id").cast("string").as("pad")))
      val right = (1 to 101).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      val joined = left.join(right.hint("merge"), Seq("k"))
      // collect() drives THIS QueryExecution to its final adaptive plan
      // (count() would execute a different, wrapped QueryExecution)
      assert(joined.collect().length == 33000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE did not mark the skewed partition:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE-only vs decideSalts on one hot-key fixture: AQE rescues the join, " +
      "never the non-decomposable agg — salting still owns that half") {
    import graft.ops.ScaleJoins
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (30k padded rows) + a 100-key tail — the same
      // distribution feeds a join and an agg below
      val left = spark.range(30000).select(lit(1L).as("k"),
          concat(lit("x" * 56), col("id")).as("v"))
        .union(spark.range(3000).select((col("id") % 100 + 2).as("k"),
          col("id").cast("string").as("v")))
      // the measurement says "hot" either way
      val d = ScaleJoins.decideSalts(left, "k")
      assert(d.salted && d.maxSkew > 4.0, s"fixture must read as skewed: $d")
      // JOIN half: AQE splits the skewed partition AT RUNTIME — so the
      // decision rule for joins is AQE-first (no replication cost, no
      // salt column); decideSalts is the fallback for pre-AQE stages
      val right = (1 to 101).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      val joined = left.join(right.hint("merge"), Seq("k"))
      assert(joined.collect().length == 33000)
      assert(joined.queryExecution.executedPlan.toString.toLowerCase
        .contains("skew"), "AQE must handle the join-side skew")
      // AGG half: the same skew under a NON-DECOMPOSABLE aggregate —
      // AQE's executed plan shows NO skew handling (it never splits an
      // aggregate partition; all of key 1's state builds on one reducer)
      val direct = left.groupBy($"k")
        .agg(array_sort(collect_set($"v")).as("values"))
      val directRows = direct.collect()
      assert(!direct.queryExecution.executedPlan.toString.toLowerCase
        .contains("skew"),
        "AQE unexpectedly claims skew handling for an aggregate")
      // ... which is exactly where the salted two-stage agg steps in:
      // identical result, hot state spread over d.salts reducers
      val salted = ScaleJoins.saltedDistinctValues(left, "k", "v", d.salts)
      assert(salted.collect().toSet == directRows.toSet,
        "salted two-stage agg diverged from the direct aggregate")
      // load evidence: max rows landing on one reducer drops ~salts-fold
      // when the exchange key is (k, salt) instead of k
      def maxPart(cols: org.apache.spark.sql.Column*): Long =
        left.repartition(8, cols: _*)
          .select(spark_partition_id().as("p"))
          .groupBy($"p").count().agg(max($"count")).head().getLong(0)
      val saltCol = pmod(xxhash64($"v"), lit(d.salts))
      assert(maxPart($"k", saltCol) * 2 < maxPart($"k"),
        "salting failed to spread the hot key's reducer load")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
