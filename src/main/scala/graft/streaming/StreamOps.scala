package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming plumbing — SURVEY.md §2B.9.
  *
  * Reference analogue: Fossa's always-on broker consume loops
  * (rabbit_mq/message_exchange.py:49-141, process_pool.py:92-175) — an
  * unbounded source of events processed incrementally. Here that surface
  * is Spark Structured Streaming: file-source replay of the `events`
  * table, event-time windows + watermarks, checkpointed state.
  *
  * The correctness oracle is batch-equivalence (stream/batch unification):
  * each streaming query is run to completion with `Trigger.AvailableNow`
  * into a memory sink and must equal the same logic run with
  * `spark.read` — DuckDB-checkable SQL.
  */
object StreamOps {

  /** Parquet schema of `events` with ns-timestamps read as long
    * (file-source streams need an explicit schema).
    */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Unbounded `events` stream from the parquet file source (ordered file
    * replay; at scale this is a directory that keeps receiving files —
    * the file source tracks processed files in the checkpoint).
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(eventsRawSchema)
      .parquet(stageDir(dir))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The file source wants a directory of files (the unbounded-ingest
    * shape); the fixture is a single parquet file. Stage a scratch dir
    * with a symlink to it (per source dir, created once).
    */
  private def stageDir(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val slug = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_stream", s"events_$slug")
    val link = base.resolve("events.parquet")
    if (!Files.exists(link)) {
      Files.createDirectories(base)
      Files.createSymbolicLink(link, Paths.get(dir, "events.parquet"))
    }
    base.toString
  }

  /** Run a streaming frame to completion (AvailableNow) into a memory
    * sink and return the final result table. `complete` mode for
    * aggregations replays full state; `append`/`update` for row streams.
    */
  def runToMemory(df: DataFrame, name: String, mode: String): DataFrame =
    withStreamingPartitions(df.sparkSession) {
      val q = df.writeStream
        .format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      df.sparkSession.table(name)
    }

  /** Stateful streaming ops allocate one state store per shuffle
    * partition per operator; a batch-oriented partition count (32+) buys
    * nothing at micro-batch sizes and multiplies store init/commit cost.
    * Pin a small count for the duration of a streaming run. (The sink
    * partitioning is fixed at query START — restoring the conf afterwards
    * does not affect the running query.)
    */
  private def withStreamingPartitions[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try body finally spark.conf.set(key, prev)
  }

  /** Run `body` (which starts+finishes streaming queries) against the
    * RocksDB state store provider instead of the default in-memory
    * HDFS-backed one — the production choice once per-key state exceeds
    * executor heap (large dedup/join/session state at 100 TB): state
    * lives off-heap in RocksDB with changelog/snapshot recovery.
    * `transformWithState` requires it. Provider is bound at query START,
    * so restoring the conf afterwards doesn't disturb the finished run.
    */
  def withRocksDB[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Run a streaming frame through foreachBatch into a parquet dir (the
    * arbitrary-sink hook — reference's on_completion_callback analogue,
    * governor.py:309), then read the result back.
    */
  def runForeachBatchParquet(df: DataFrame, outDir: String): DataFrame = {
    val spark = df.sparkSession
    val target = new java.io.File(outDir)
    if (target.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(): Unit
      }
      rm(target)
    }
    val q = df.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("append").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }
}
