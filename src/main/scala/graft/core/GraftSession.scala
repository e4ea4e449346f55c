package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory — the engine's recommended Spark configuration
  * (SURVEY.md §7.1 `SparkProvider`): deterministic UTC semantics, AQE with
  * skew-join handling, and a shuffle-partition count sized to the
  * environment instead of Spark's legacy 200.
  *
  * Local mode is for development/tests; on a cluster, pass the builder
  * through `configure` so the same engine settings apply under any master.
  */
object GraftSession {

  /** Apply the engine's settings to any builder — including the engine's
    * SparkSessionExtensions (custom SQL functions + the SmallResultSort
    * rule), so cluster sessions get the same surface as [[local]].
    */
  def configure(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .withExtensions(new graft.functions.GraftExtensions)

  /** Local session: `local[cores]` with shuffle partitions = cores. */
  def local(cores: Int = math.min(32, Runtime.getRuntime.availableProcessors()),
            appName: String = "graft", ui: Boolean = false): SparkSession = {
    val s = configure(SparkSession.builder(), cores)
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.ui.enabled", ui.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
