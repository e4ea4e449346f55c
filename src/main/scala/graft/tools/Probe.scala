package graft.tools
// Temporary profiling scratchpad (removed before round end).
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.graft.smallResultSort","true")
      .config("spark.graft.compactScans", sys.env.getOrElse("SPARK_GRAFT_COMPACT","true"))
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = { f; f; val t0=System.nanoTime(); f; f; f; println(f"PROBE $tag ${(System.nanoTime()-t0)/3e9}%.3f s") }
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      time(name) { noop(fn(spark, dir)) }
    }
    spark.stop()
  }
}
