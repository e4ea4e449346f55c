package graft.api

import org.apache.spark.sql.SparkSession
import graft.exec.{JobRunner, StatusRegistry, TaskRegistry, TaskSource}
import graft.model.EtlModel
import graft.tools.EngineLog

/** Node configuration — the analogue of the reference's config object
  * (settings/global_config.py:1-15): accepted model classes, sidecar task
  * sources, external log sinks, the HTTP port, and the
  * `CPU_TASK_RATIO`-style capacity knob (app.py:80-83: tasks to run in
  * parallel per CPU; `maxConcurrentTasks` overrides it when set, the
  * constructor-arg path).
  */
final case class EngineConfig(
    appTitle: String = "graft",
    httpPort: Int = 0, // 0 = ephemeral (reference default is fixed 2345)
    acceptedModels: Seq[EtlModel] = Nil,
    taskSources: Seq[TaskSource] = Nil,
    externalLoggers: Map[String, EngineLog.ExternalLogSink] = Map.empty,
    logToStdout: Boolean = true,
    cpuTaskRatio: Option[Double] = None,
    maxConcurrentTasks: Option[Int] = None,
    taskRetries: Int = 1) {

  /** Capacity resolution order: explicit override, then cpu ratio × cores,
    * else the engine default (8).
    */
  def resolvedCapacity(cores: Int): Int =
    maxConcurrentTasks.getOrElse(
      cpuTaskRatio.map(r => math.max(1, math.ceil(r * cores).toInt)).getOrElse(8))
}

/** Assembled engine node — the `create_app` analogue (app.py:33-87): wires
  * the registry gate, status tables, governor (JobRunner), sidecar task
  * sources, external loggers, and the HTTP status/submission facade into
  * one start/stoppable unit.
  */
final class GraftApp(spark: SparkSession, config: EngineConfig) {

  val registry = new TaskRegistry
  val status = new StatusRegistry
  val runner = new JobRunner(spark, registry, status,
    maxConcurrentTasks =
      config.resolvedCapacity(spark.sparkContext.defaultParallelism),
    taskRetries = config.taskRetries)
  val server = new StatusServer(runner, registry, status,
    nodeIdent = config.appTitle,
    maxConcurrentTasks =
      config.resolvedCapacity(spark.sparkContext.defaultParallelism))

  @volatile private var port: Option[Int] = None

  def httpPort: Option[Int] = port

  @volatile private var prevEcho: Option[Boolean] = None

  /** Register classes, attach loggers + sidecars, open the HTTP facade.
    * Returns the bound port.
    */
  def start(): Int = {
    // capture the process-wide echo flag so stop() can restore it —
    // silencing engine logging must not outlive this app
    prevEcho = Some(EngineLog.echoToConsole)
    EngineLog.echoToConsole = config.logToStdout
    config.externalLoggers.foreach { case (n, s) => EngineLog.addSink(n, s) }
    config.acceptedModels.foreach(registry.register)
    config.taskSources.foreach(runner.attachSource)
    val p = server.start(config.httpPort)
    port = Some(p)
    EngineLog.log(s"${config.appTitle} node up on port $p " +
      s"(capacity ${runner.availableCapacity})")
    p
  }

  def stop(): Unit = {
    server.stop()
    runner.shutdown()
    runner.close()
    config.externalLoggers.keys.foreach(EngineLog.removeSink)
    prevEcho.foreach(EngineLog.echoToConsole = _)
    prevEcho = None
    port = None
  }
}
