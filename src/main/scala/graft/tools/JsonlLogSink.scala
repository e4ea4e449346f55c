package graft.tools

/** JSONL file sink — the engine's concrete [[EngineLog.ExternalLogSink]]
  * (A20 parity with the reference's CloudWatch logger,
  * `/root/reference/lib/fossa/tools/logging_cloudwatch.py:9-90`, minus
  * the cloud dependency). Like that logger's pickle-safe (group, stream,
  * region) config, this sink's whole state is its PATH: it serializes,
  * crosses process boundaries, and RE-ATTACHES — any process that knows
  * the path constructs a sink and appends to the same stream.
  *
  * One JSON object per line: {"ts", "level", "pid", "message"}. The file
  * opens lazily in append mode and every write flushes, so a crash loses
  * at most the in-flight line and concurrent attachments interleave
  * whole lines (single write syscall per line on an O_APPEND stream).
  */
final class JsonlLogSink(val path: String)
    extends EngineLog.ExternalLogSink with Serializable {

  @transient private var out: java.io.Writer = _

  private def writer(): java.io.Writer = {
    if (out == null) {
      val f = new java.io.File(path)
      Option(f.getParentFile).foreach(_.mkdirs())
      out = new java.io.OutputStreamWriter(
        new java.io.FileOutputStream(f, true),
        java.nio.charset.StandardCharsets.UTF_8)
    }
    out
  }

  private def esc(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  override def write(level: String, message: String): Unit = synchronized {
    val ts = java.time.Instant.now().toString
    val pid = ProcessHandle.current().pid()
    val w = writer()
    w.write(
      s"""{"ts":"$ts","level":"${esc(level)}","pid":$pid,"message":"${esc(message)}"}""" + "\n")
    w.flush()
  }

  /** Detach: close the stream; the next write re-opens (re-attach). */
  def close(): Unit = synchronized {
    if (out != null) { out.close(); out = null }
  }
}
