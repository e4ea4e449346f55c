package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology (documented in BASELINE.md): per query, one warmup run
  * (pays JVM/codegen JIT — DuckDB has no analogue of that one-time cost)
  * then one timed run; both runs force FULL materialisation through the
  * `noop` sink so projections can't be pruned by a count-only action
  * (which would under-measure; the DuckDB baseline fetches all rows too).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // stdout carries exactly ONE JSON line — engine logs must not leak there
    graft.tools.EngineLog.echoToConsole = false
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        once(fn) // warmup: codegen + JIT + page cache
        // min of 2 timed runs: GC/scheduler jitter otherwise dominates the
        // small-SF numbers
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          once(fn)
          (System.nanoTime() - t0) / 1e9
        }
        runs.min
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      name -> t
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val ok = results.filter(_._2 >= 0)
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total_warm_sec","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"n_failed":${results.size - ok.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
