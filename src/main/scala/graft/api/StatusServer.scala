package graft.api

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.exec.{JobRunner, StatusRegistry, TaskRegistry}
import graft.exec.Tasks._

/** Minimal HTTP status/submission facade reproducing the reference's JSON
  * shapes (views/api.py:28-103, views/controller.py:5-80):
  *
  *   POST /api/0.01/task       → {task_id, status_url} | 400/412/503
  *   GET  /api/0.01/task/<id>  → task summary
  *   GET  /api/0.01/node_info  → node + running + recent tasks
  *
  * Uses only the JDK's built-in HttpServer — the engine has no web
  * framework dependency; this is a thin ops veneer over
  * [[graft.exec.StatusRegistry]].
  */
final class StatusServer(
    runner: JobRunner,
    registry: TaskRegistry,
    status: StatusRegistry,
    nodeIdent: String = "graft-node",
    maxConcurrentTasks: Int = 8) {

  private var server: Option[HttpServer] = None

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def taskJson(r: TaskRecord): String = {
    val origin = r.outcome.collect {
      case TaskFailed(_, _, Some(o)) => s""","failure_origin_task_id":${jsonStr(o)}"""
    }.getOrElse("")
    val exc = r.outcome.collect {
      case TaskFailed(cls, _, _) => s""","exception_class_name":${jsonStr(cls)}"""
    }.getOrElse("")
    s"""{"task_id":${jsonStr(r.spec.taskId)},"model_class":${jsonStr(r.spec.modelClass)},""" +
      s""""method":${jsonStr(r.spec.method)},"status":${jsonStr(r.status)},""" +
      s""""started":${jsonStr(r.started.toString)},""" +
      s""""finished":${r.finished.map(f => jsonStr(f.toString)).getOrElse("null")}""" +
      s"""$exc$origin}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  /** Crude single-level JSON-object field extraction (string values). */
  private def field(body: String, name: String): Option[String] = {
    val m = ("\"" + name + "\"\\s*:\\s*\"([^\"]*)\"").r
    m.findFirstMatchIn(body).map(_.group(1))
  }

  def start(port: Int = 0): Int = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    s.createContext("/api/0.01/node_info", (ex: HttpExchange) => {
      val running = status.runningTasks.map(taskJson).mkString("[", ",", "]")
      val recent = status.recentCompleted().map(taskJson).mkString("[", ",", "]")
      respond(ex, 200,
        s"""{"node_info":{"node_ident":${jsonStr(nodeIdent)},""" +
          s""""max_concurrent_tasks":$maxConcurrentTasks,""" +
          s""""available_processing_capacity":${runner.availableCapacity}},""" +
          s""""running_tasks":$running,"recent_completed_tasks":$recent}""")
    })
    s.createContext("/api/0.01/task", (ex: HttpExchange) => {
      val path = ex.getRequestURI.getPath
      if (ex.getRequestMethod == "GET" && path.matches(".*/task/[^/]+$")) {
        val id = path.substring(path.lastIndexOf('/') + 1)
        status.record(id) match {
          case Some(r) => respond(ex, 200, taskJson(r))
          case None => respond(ex, 200,
            s"""{"task_id":${jsonStr(id)},"status":"unknown"}""")
        }
      } else if (ex.getRequestMethod == "POST") {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        field(body, "model_class") match {
          case None =>
            respond(ex, 400, """{"error":"model_class is mandatory"}""")
          case Some(cls) if !registry.isAccepted(cls) =>
            respond(ex, 412, s"""{"error":${jsonStr(s"class '$cls' not accepted")}}""")
          case Some(cls) =>
            val spec = TaskSpec(modelClass = cls,
              method = field(body, "method").getOrElse("go"))
            try {
              runner.submit(spec, blockMillis = 1000): Unit
              respond(ex, 200,
                s"""{"task_id":${jsonStr(spec.taskId)},""" +
                  s""""status_url":${jsonStr(s"/api/0.01/task/${spec.taskId}")}}""")
            } catch {
              case _: NoCapacity =>
                respond(ex, 503, """{"error":"no processing capacity"}""")
            }
        }
      } else respond(ex, 404, """{"error":"not found"}""")
    })
    s.start()
    server = Some(s)
    s.getAddress.getPort
  }

  def stop(): Unit = { server.foreach(_.stop(0)); server = None }
}
