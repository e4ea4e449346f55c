package graft.exec

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path}
import java.util.concurrent.TimeUnit
import scala.concurrent.Future
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal
import scala.util.{Failure, Success}
import graft.exec.Tasks._

/** A21 — sidecar task source, the analogue of the reference's
  * `AbstractMycorrhiza` (control/broker.py:8-101). A sidecar is a
  * run-forever loop attached to the engine that (i) fetches task details
  * from an external source, (ii) submits them into the governor once it
  * has capacity, (iii) sends results back toward the originating task,
  * and (iv) logs through the engine log ([[graft.tools.EngineLog]]).
  *
  * `runForever` executes on a dedicated daemon thread owned by the
  * [[JobRunner]] (the reference's separate-process analogue);
  * [[submitTask]] is the capacity-aware bounded-wait submission helper
  * mirroring `AbstractMycorrhiza.submit_task` / `wait_for_capacity`
  * (broker.py:52-108): a `None` return means "not submitted this round,
  * retry on the next poll".
  */
abstract class TaskSource {
  def name: String

  @volatile private var stopped = false
  final def stop(): Unit = stopped = true
  final protected def running: Boolean = !stopped

  /** Loop for the engine's lifetime, polling the external source and
    * submitting via [[submitTask]]. Must return promptly once [[running]]
    * turns false.
    */
  def runForever(runner: JobRunner): Unit

  /** Wait up to `timeoutMillis` for governor capacity, then submit.
    * @return the outcome future, or None on capacity timeout (caller
    *         should retry — broker.py:60-62 contract).
    */
  final protected def submitTask(runner: JobRunner, spec: TaskSpec,
      timeoutMillis: Long = 3000): Option[Future[TaskOutcome]] = {
    val deadline = System.nanoTime() + TimeUnit.MILLISECONDS.toNanos(timeoutMillis)
    while (!runner.hasCapacity) {
      if (System.nanoTime() > deadline || stopped) return None
      Thread.sleep(20)
    }
    val left = math.max(1, TimeUnit.NANOSECONDS.toMillis(deadline - System.nanoTime()))
    try Some(runner.submit(spec, blockMillis = left))
    catch { case _: NoCapacity => None }
  }
}

/** Concrete sidecar: watches a spool directory for `*.task` files. Each
  * file's body is `modelClass[:method]`; the file is consumed, submitted
  * as a task, and the outcome is written back beside it as
  * `<stem>.result.json` — the "send results back to the originating task"
  * leg of the sidecar contract, with a file-drop protocol standing in for
  * the reference's messaging service. Malformed or rejected drops get a
  * `failed` result file rather than wedging the loop.
  *
  * Durable handoff (A17 — the reference ACKs only after governor handoff
  * and relies on persistent delivery, rabbit_mq/pika_client.py:74-75,
  * message_exchange.py:123): an accepted drop is RENAMED into
  * `inflight/`, not deleted, and cleaned up only after its result file is
  * written. On start, anything still in `inflight/` — submitted by a
  * previous engine run that died before writing a result — is restored to
  * the spool and re-submitted (at-least-once redelivery, like an
  * unacknowledged broker message).
  */
final class DirectoryTaskSource(spoolDir: Path, pollMillis: Long = 100)
    extends TaskSource {
  import java.nio.file.StandardCopyOption.REPLACE_EXISTING
  import scala.concurrent.ExecutionContext.Implicits.global

  def name: String = s"dir-watch:$spoolDir"

  private def inflightDir: Path = spoolDir.resolve("inflight")

  override def runForever(runner: JobRunner): Unit = {
    Files.createDirectories(spoolDir)
    Files.createDirectories(inflightDir)
    // crash recovery: restore unacknowledged drops for re-submission
    val leftovers = {
      val s = Files.list(inflightDir)
      try s.iterator().asScala.filter(_.toString.endsWith(".task"))
        .toSeq.sortBy(_.toString)
      finally s.close()
    }
    leftovers.foreach { p =>
      graft.tools.EngineLog.log(
        s"sidecar $name: redelivering inflight drop ${p.getFileName}", "WARNING")
      Files.move(p, spoolDir.resolve(p.getFileName.toString), REPLACE_EXISTING): Unit
    }
    graft.tools.EngineLog.log(s"sidecar $name started")
    while (running) {
      val drops = {
        val s = Files.list(spoolDir)
        try s.iterator().asScala.filter(_.toString.endsWith(".task"))
          .toSeq.sortBy(_.toString)
        finally s.close()
      }
      drops.foreach(handle(runner, _))
      try Thread.sleep(pollMillis)
      catch { case _: InterruptedException => return } // engine shutdown
    }
    graft.tools.EngineLog.log(s"sidecar $name stopped")
  }

  private def handle(runner: JobRunner, f: Path): Unit = {
    val resultPath = f.resolveSibling(
      f.getFileName.toString.stripSuffix(".task") + ".result.json")
    def writeResult(taskId: String, status: String, extra: String): Unit =
      Files.write(resultPath,
        s"""{"task_id":"$taskId","status":"$status"$extra}""".getBytes(UTF_8)): Unit
    try {
      val body = new String(Files.readAllBytes(f), UTF_8).trim
      val parts = body.split(":", 2)
      val spec = TaskSpec(modelClass = parts(0),
        method = if (parts.length > 1 && parts(1).nonEmpty) parts(1) else "go")
      submitTask(runner, spec) match {
        case Some(fut) =>
          // late-ACK: park the drop in inflight/ until the result lands
          val parked = inflightDir.resolve(f.getFileName.toString)
          Files.move(f, parked, REPLACE_EXISTING)
          fut.onComplete { outcome =>
            outcome match {
              case Success(TaskComplete(rows)) =>
                writeResult(spec.taskId, "complete", s""","rows":$rows""")
              case Success(TaskFailed(cls, _, _)) =>
                writeResult(spec.taskId, "failed", s""","exception_class_name":"$cls"""")
              case Failure(e) =>
                writeResult(spec.taskId, "failed",
                  s""","exception_class_name":"${e.getClass.getName}"""")
            }
            Files.deleteIfExists(parked): Unit // ACK: result durably beside the drop
          }
        case None => () // governor full this round; file stays, retried next poll
      }
    } catch {
      case NonFatal(e) => // bad drop (unknown class/method, unreadable file)
        Files.deleteIfExists(f)
        writeResult("", "failed", s""","exception_class_name":"${e.getClass.getName}"""")
    }
  }
}
