package graft.exec

import java.util.concurrent.{Executors, Semaphore, TimeUnit}
import scala.concurrent.{ExecutionContext, Future}
import scala.util.control.NonFatal
import org.apache.spark.sql.SparkSession
import graft.core.EngineContext
import graft.exec.Tasks._
import graft.model.{EtlModel, PartitionedEtlModel, SubTask, SubTaskResult}

/** Task execution engine — the governor + isolated-processor pair of the
  * reference (governor.py:200-320, process.py:57-168) mapped onto Spark:
  *
  *  - admission: accepted-class gate + bounded capacity (A3/A4); a full
  *    scoreboard raises [[Tasks.NoCapacity]] — the 503 analogue — instead
  *    of spin-waiting;
  *  - isolation: each task runs under its own Spark job group (the
  *    process-per-task analogue), so `cancel` kills exactly that task's
  *    jobs (A19);
  *  - fan-out: partitioned models scatter as ONE distributed job
  *    (`Dataset[SubTask].repartition(k).mapPartitions`), gather unordered
  *    on the driver, retry failed subtasks (`taskRetries`, default 1 —
  *    process_pool.py:27), and propagate exhausted failures to the parent
  *    with the failing subtask's id (A11/A12);
  *  - status: every transition lands in the [[StatusRegistry]] tables.
  */
final class JobRunner(
    spark: SparkSession,
    registry: TaskRegistry,
    status: StatusRegistry,
    maxConcurrentTasks: Int = 8,
    taskRetries: Int = 1) {

  spark.sparkContext.addSparkListener(status)

  private val capacity = new Semaphore(maxConcurrentTasks)
  private val pool = Executors.newCachedThreadPool()
  private implicit val ec: ExecutionContext =
    ExecutionContext.fromExecutorService(pool)

  def availableCapacity: Int = capacity.availablePermits()
  def hasCapacity: Boolean = availableCapacity > 0

  /** Validate + admit a task (api.py:28-72 semantics): unknown class →
    * InvalidTaskSpec (412), no capacity within `blockMillis` → NoCapacity
    * (503). Returns the future outcome; the task id is in the spec.
    */
  def submit(spec: TaskSpec, blockMillis: Long = 1000): Future[TaskOutcome] = {
    val model = validate(spec) // 412 before queueing
    if (!capacity.tryAcquire(blockMillis, TimeUnit.MILLISECONDS))
      throw new NoCapacity(
        s"no processing capacity for '${spec.modelClass}' within ${blockMillis}ms")
    Future {
      try runAdmitted(spec, model)
      finally capacity.release()
    }
  }

  /** Synchronous execution (admission already done, `model` the single
    * per-task instance constructed at admission — factory constructors
    * with side effects must run exactly once per task).
    */
  private def runAdmitted(spec: TaskSpec, model: EtlModel): TaskOutcome = {
    val ctx = EngineContext(spark, spec.resolverContext)
    status.markRunning(spec)
    spark.sparkContext.setJobGroup(spec.taskId,
      s"graft task ${spec.taskId}: ${spec.modelClass}.${spec.method}",
      interruptOnCancel = true)
    graft.tools.EngineLog.log(
      s"task ${spec.taskId} ${spec.modelClass}.${spec.method} started")
    val outcome =
      try {
        // Per-task cache + scratch scopes: any CacheScope.track/adopt the
        // model's query code performs is released when THIS task's action
        // completes (or fails) — and only this task's; concurrent tasks
        // each run in their own scope (the global-buffer alternative
        // would let one task's release unpersist another's live caches).
        // Scratch dirs the task registers are deleted immediately on
        // failure/cancel (nothing will ever read them) and kept until JVM
        // exit on success (the returned frame reads them lazily).
        graft.core.Scratch.taskScoped {
          graft.core.CacheScope.scoped {
            model match {
              case pm: PartitionedEtlModel => runPartitioned(spec, pm)
              // method dispatch — getattr(model, method)(**kwargs) analogue
              // (control/process.py:99-100); unknown method = InvalidTaskSpec
              case m => TaskComplete(
                dispatchable(m, spec)(ctx, spec.methodKwargs).count())
            }
          }
        }
      } catch {
        case e: SubTaskFailedException =>
          TaskFailed(e.getClass.getName, traceback(e), Some(e.originTaskId))
        case NonFatal(e) =>
          TaskFailed(e.getClass.getName, traceback(e), None)
      } finally {
        spark.sparkContext.clearJobGroup()
      }
    status.markFinished(spec.taskId, outcome)
    val (lvl, word) = outcome match {
      case _: TaskComplete => ("INFO", "complete")
      case _: TaskFailed => ("ERROR", "failed")
    }
    graft.tools.EngineLog.log(s"task ${spec.taskId} $word", lvl)
    outcome
  }

  /** Blocking convenience wrapper used by tests and the model queries. */
  def runSync(spec: TaskSpec): TaskOutcome = {
    val model = validate(spec)
    capacity.acquire()
    try runAdmitted(spec, model) finally capacity.release()
  }

  /** Accepted-class + known-method gate (both are InvalidTaskSpec → the
    * 412 analogue). Partitioned models run via their slices, so the
    * top-level `method` is not dispatched there. Returns the constructed
    * instance so dispatch reuses it — model_cls(**model_construction_kwargs)
    * runs ONCE per task (control/process.py:89), not once per phase.
    *
    * A submission rejected later with NoCapacity has still constructed the
    * instance once: the 412-precedes-503 contract requires method
    * validation (which needs the factory's instance) before the capacity
    * verdict. Factories should therefore construct cheaply; heavy
    * resource acquisition belongs in partitionInitialise / first use.
    */
  private def validate(spec: TaskSpec): EtlModel = {
    val model = registry.resolve(spec.modelClass, spec.modelConstructionKwargs)
    model match {
      case _: PartitionedEtlModel => ()
      case m => dispatchable(m, spec): Unit
    }
    model
  }

  private def dispatchable(
      m: EtlModel, spec: TaskSpec): (EngineContext, Map[String, String]) => org.apache.spark.sql.DataFrame =
    m.methods.getOrElse(spec.method, throw new InvalidTaskSpec(
      s"model '${spec.modelClass}' has no method '${spec.method}' " +
        s"(has: ${m.methods.keys.toSeq.sorted.mkString(", ")})"))

  /** Scatter/gather for partitioned models (§3.3 of SURVEY): plea →
    * slice → one distributed job per attempt round → unordered driver
    * fold via the completion callbacks.
    */
  private def runPartitioned(spec: TaskSpec, pm: PartitionedEtlModel): TaskOutcome = {
    import spark.implicits._
    val plea = pm.partitionPlea
    val workers = math.max(plea.minimum, math.min(plea.maximum, plea.optimal))
    var pending = pm.partitionSlice(workers)
    var attempt = 0
    var done = 0L
    while (pending.nonEmpty && attempt <= taskRetries) {
      val results = spark.createDataset(pending)
        .repartition(math.min(workers, pending.size))
        .mapPartitions { sts =>
          // per-worker init before any subtask (process.py:91-92)
          if (sts.hasNext) pm.partitionInitialise(spec.partitionInitialiseKwargs)
          sts.map { st =>
            try SubTaskResult(st.method, st.kwargs, ok = true,
              value = pm.runSubTask(st), error = "")
            catch {
              case NonFatal(e) => SubTaskResult(st.method, st.kwargs,
                ok = false, value = "", error = e.toString)
            }
          }
        }
        // unordered gather: results surface in partition-completion order
        .toLocalIterator()
      val failed = Seq.newBuilder[SubTaskResult]
      results.forEachRemaining { r =>
        if (r.ok) { done += 1; pm.onSubtaskComplete(r) }
        else failed += r
      }
      val failedNow = failed.result()
      pending = failedNow.map(r => SubTask(r.method, r.kwargs))
      if (pending.nonEmpty && attempt == taskRetries) {
        val first = failedNow.head
        failedNow.foreach(pm.onSubtaskFailed)
        throw new SubTaskFailedException(
          s"${spec.taskId}::${first.method}",
          s"subtask '${first.method}' failed after ${taskRetries + 1} attempts: ${first.error}")
      }
      attempt += 1
    }
    TaskComplete(done)
  }

  /** Kill one running task's Spark jobs (A19; governor.py:421-451). */
  def cancel(taskId: String): Unit = spark.sparkContext.cancelJobGroup(taskId)

  private val sources =
    scala.collection.mutable.ArrayBuffer.empty[(TaskSource, Thread)]

  /** Attach a sidecar task source (A21; broker.py's `run_forever` contract):
    * the source runs on its own daemon thread for the runner's lifetime,
    * submitting into this governor as capacity allows.
    */
  def attachSource(src: TaskSource): Unit = synchronized {
    val th = new Thread(() =>
      try src.runForever(this)
      catch { case NonFatal(e) =>
        graft.tools.EngineLog.log(s"sidecar ${src.name} died: $e", "ERROR")
      }, s"graft-sidecar-${src.name}")
    th.setDaemon(true)
    th.start()
    sources += ((src, th)): Unit
  }

  private def stopSources(): Unit = synchronized {
    sources.foreach { case (s, th) => s.stop(); th.interrupt() }
    sources.clear()
  }

  /** Graceful shutdown: cancel everything still running. */
  def shutdown(): Unit = {
    stopSources()
    status.runningTasks.foreach(r => cancel(r.spec.taskId))
    pool.shutdown(): Unit
  }

  /** Detach from the SparkContext (listener) and stop the pool — call for
    * short-lived runners so listeners don't accumulate on the session.
    */
  def close(): Unit = {
    stopSources()
    spark.sparkContext.removeSparkListener(status)
    pool.shutdown(): Unit
  }

  private def traceback(e: Throwable): Seq[String] =
    e.getStackTrace.take(12).map(_.toString).toSeq
}
