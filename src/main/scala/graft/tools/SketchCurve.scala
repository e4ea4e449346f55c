package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Measured cost/precision curve for the q104/q122 profile family — the
  * evidence behind the sketch-parameter choice (rsd, approx_percentile
  * accuracy) and the exact-profile plan shape. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 ... graft.tools.SketchCurve
  *
  * Prints one line per variant: median-of-3 seconds (after 2 warmups)
  * plus the NDV/p50 deviation vs the exact answer, so the chosen point
  * on the curve is recorded, not asserted. (BASELINE.md quotes the
  * output.)
  */
object SketchCurve {
  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount")

  private def approxProfile(l: DataFrame, rsd: Double, acc: Int): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"ndv_$c"),
        round(min(col(c)), 6).as(s"min_$c"),
        round(max(col(c)), 6).as(s"max_$c"),
        round(expr(s"approx_percentile($c, 0.5, $acc)").cast(DoubleType), 6)
          .as(s"p50_$c"))
    }
    l.agg(count(lit(1)).as("n"), aggs: _*)
  }

  private def exactAgg(l: DataFrame): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"nn_$c"),
        countDistinct(col(c)).as(s"ndv_$c"),
        round(min(col(c)), 6).as(s"min_$c"),
        round(max(col(c)), 6).as(s"max_$c"),
        round(expr(s"percentile($c, 0.5)"), 6).as(s"p50_$c"))
    }
    l.agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Measured-and-REJECTED alternative exact plan: one (col, value)
    * grouped pre-aggregation (explode to slim pairs, hash-shuffle to the
    * ~k·NDV distinct-value frame, NDV = its row count, exact median from
    * a cumulative-count window) instead of the multi-`countDistinct`
    * Expand + `percentile` value buffers. Plausible on paper; at sf0.1
    * it measured SLOWER than the built-in plan (2.08 s vs 1.80 s — the
    * explode+shuffle costs more than Expand's replication), so q104
    * keeps the built-ins. Kept here so the curve stays reproducible.
    */
  private def exactGrouped(l: DataFrame): DataFrame = {
    val s = l.sparkSession
    import s.implicits._
    val pairs = l.select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast(DoubleType).as("v"))): _*)).as("p"))
      .select($"p.col_name", $"p.v")
    val grouped = pairs.groupBy($"col_name", $"v").agg(count(lit(1)).as("cnt"))
    val totals = grouped.groupBy($"col_name").agg(
      sum($"cnt").as("n"),
      coalesce(sum(when($"v".isNull, $"cnt")), lit(0L)).as("n_null"),
      count(when($"v".isNotNull, lit(1))).as("ndv"),
      round(min($"v"), 6).as("min6"),
      round(max($"v"), 6).as("max6"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"col_name").orderBy($"v")
    val cum = grouped.filter($"v".isNotNull)
      .withColumn("cum", sum($"cnt").over(w))
      .join(broadcast(totals.select($"col_name", ($"n" - $"n_null").as("nn"))),
        Seq("col_name"))
      .withColumn("r", ($"nn" - 1).cast(DoubleType) / 2.0)
      .withColumn("k1", floor($"r"))
      .withColumn("k2", ceil($"r"))
    val p50 = cum.groupBy($"col_name").agg(
      round(
        min(when($"cum" > $"k1", $"v")) +
          (first($"r") - first($"k1")) *
            (min(when($"cum" > $"k2", $"v")) - min(when($"cum" > $"k1", $"v"))),
        6).as("p50_6"))
    totals.join(p50, Seq("col_name"), "left")
      .select($"col_name", $"n", $"n_null", $"ndv", $"min6", $"max6", $"p50_6")
  }

  def main(args: Array[String]): Unit = {
    graft.tools.EngineLog.echoToConsole = false
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.smallResultSort", "true")
      .config("spark.graft.compactScans", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val l = graft.core.Tables.t(spark, sfDir, "lineitem")

    def time(label: String, df: => DataFrame): Seq[Double] = {
      (1 to 2).foreach(_ => df.write.format("noop").mode("overwrite").save())
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s median ${runs.sorted.apply(1)}%6.2f s  runs ${runs.map(r => f"$r%.2f").mkString("[", ", ", "]")}")
      runs
    }

    // exact reference values for deviation reporting
    val exact = exactAgg(l).collect()(0)
    def dev(df: DataFrame): String = {
      val r = df.collect()(0)
      cols.map { c =>
        val en = exact.getAs[Long](s"ndv_$c").toDouble
        val an = r.getAs[Long](s"ndv_$c").toDouble
        val ep = exact.getAs[Double](s"p50_$c")
        val ap = r.getAs[Double](s"p50_$c")
        f"$c ndv ${100 * math.abs(an - en) / en}%.2f%% p50Δ ${math.abs(ap - ep)}%.4g"
      }.mkString("  |  ")
    }

    time("exact (q104 multi-agg)", exactAgg(l))
    time("exact (grouped pre-agg)", exactGrouped(l))
    for ((rsd, acc) <- Seq((0.01, 10000), (0.02, 10000), (0.05, 10000),
        (0.01, 1000), (0.02, 1000))) {
      time(f"approx rsd=$rsd%.2f acc=$acc", approxProfile(l, rsd, acc))
      println("    deviation: " + dev(approxProfile(l, rsd, acc)))
    }
    spark.stop()
  }
}
