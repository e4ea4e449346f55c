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

  /** Example user model: revenue per nation (resolver context carries the
    * data directory, the reference's `{output_datasets}` pattern).
    */
  final class RevenuePerNationModel extends EtlModel {
    override def name: String = "RevenuePerNation"
    override def build(ctx: EngineContext): DataFrame = {
      val spark = ctx.spark
      import spark.implicits._
      val dir = ctx.resolve("{data_dir}")
      Tables.t(spark, dir, "lineitem")
        .join(Tables.t(spark, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(Tables.t(spark, dir, "customer"), $"o_custkey" === $"c_custkey")
        .join(broadcast(Tables.t(spark, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(dec2($"l_extendedprice") * (lit(1) - dec2($"l_discount")))
          .cast(DoubleType).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"n_name".asc_nulls_first)
    }
  }

  /** Q57 — run the model through the full task lifecycle (registry gate,
    * job group, status tables) and return its frame.
    */
  def q57(spark: SparkSession, dir: String): DataFrame = {
    val registry = new TaskRegistry
    val status = new StatusRegistry
    val runner = new JobRunner(spark, registry, status, maxConcurrentTasks = 2)
    val model = new RevenuePerNationModel
    registry.register(model)
    val spec = TaskSpec(modelClass = "RevenuePerNation",
      resolverContext = Map("data_dir" -> dir))
    try {
      runner.runSync(spec) // lifecycle: running → complete in status tables
      require(status.status(spec.taskId) == "complete",
        s"model task ended ${status.status(spec.taskId)}")
    } finally runner.close() // don't leave per-query listeners on the session
    model.build(EngineContext(spark, Map("data_dir" -> dir)))
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
