package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{EngineContext, Tables}
import graft.core.Tables._
import graft.exec.{JobRunner, StatusRegistry, TaskRegistry}
import graft.exec.Tasks.TaskSpec
import graft.model.EtlModel

/** SURVEY.md §2B.10 Q57 — the whole-model hook: user Scala code over
  * DataFrames, admitted through the accepted-class registry gate (A3) and
  * executed under a task job group with status tracking — the analogue of
  * Fossa running a registered `ayeaye.Model` (process.py:89-100).
  */
object ModelQueries {

  /** Example user model: revenue per nation. Like the reference's models
    * (which persist outputs through Connect), the model WRITES its result
    * dataset to the `{output}` location and returns the read-back frame —
    * the engine runs the heavy plan exactly once; consumers read the
    * persisted output.
    */
  final class RevenuePerNationModel extends EtlModel {
    override def name: String = "RevenuePerNation"
    override def build(ctx: EngineContext): DataFrame = {
      val spark = ctx.spark
      import spark.implicits._
      val dir = ctx.resolve("{data_dir}")
      val result = Tables.t(spark, dir, "lineitem")
        .join(Tables.t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))
      val out = ctx.resolve("{output}/revenue_per_nation")
      result.write.mode("overwrite").parquet(out)
      spark.read.parquet(out)
    }
  }

  /** Q57 — run the model through the full task lifecycle (registry gate,
    * job group, status tables) and return its persisted output.
    */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val registry = new TaskRegistry
    val status = new StatusRegistry
    val runner = new JobRunner(spark, registry, status, maxConcurrentTasks = 2)
    val model = new RevenuePerNationModel
    registry.register(model)
    // task-id-suffixed output: two concurrent sessions on one machine must
    // not read each other's half-written parquet despite overwrite mode
    val spec = TaskSpec(modelClass = "RevenuePerNation")
    val outBase =
      s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_scratch/q57_${spec.taskId}"
    val specWithCtx = spec.copy(
      resolverContext = Map("data_dir" -> dir, "output" -> outBase))
    try {
      runner.runSync(specWithCtx) // lifecycle: running → complete in status tables
      require(status.status(spec.taskId) == "complete",
        s"model task ended ${status.status(spec.taskId)}")
    } finally runner.close() // don't leave per-query listeners on the session
    spark.read.parquet(s"$outBase/revenue_per_nation")
      .orderBy($"n_name".asc_nulls_first)
  }

  val q57Sql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | COUNT(*) AS n
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name NULLS FIRST""".stripMargin

  def all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q57_whole_model" -> (q57 _))

  def oracles: Map[String, String] = Map(
    "q57_whole_model" -> q57Sql)
}
