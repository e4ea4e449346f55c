package graft.tools

import scala.collection.concurrent.TrieMap

/** Logging fan-out — the reference's `LoggingMixin` (tools/logging.py:
  * 5-74): one `log(msg, level)` call fans out to stdout plus any number of
  * pluggable external sinks (the CloudWatch logger being upstream's
  * example). Sinks are driver-side; executor-side logging stays on log4j2
  * (Spark's own channel) — the fan-out covers engine/task lifecycle
  * events, which is what the reference used it for.
  */
object EngineLog {

  /** External log destination (AbstractExternalLogger.write analogue). */
  trait ExternalLogSink {
    def write(level: String, message: String): Unit
  }

  private val sinks = TrieMap.empty[String, ExternalLogSink]
  @volatile var echoToConsole: Boolean = true

  def addSink(name: String, sink: ExternalLogSink): Unit =
    sinks.put(name, sink): Unit

  def removeSink(name: String): Unit = sinks.remove(name): Unit

  def log(message: String, level: String = "INFO"): Unit = {
    if (echoToConsole) println(s"[$level] $message")
    sinks.values.foreach { s =>
      try s.write(level, message)
      catch { case _: Throwable => () } // a broken sink must not kill the task
    }
  }
}
