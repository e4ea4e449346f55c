package graft
import org.apache.spark.sql.SparkSession
/** Time one named query in isolation: BenchOne <name> [reps] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.graft.smallResultSort", "true")
      .config("spark.graft.compactScans",
        sys.env.getOrElse("SPARK_GRAFT_COMPACT", "true"))
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[iso] $name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
