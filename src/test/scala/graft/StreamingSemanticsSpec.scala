package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Multi-batch watermark semantics: a row arriving in a later micro-batch
  * with event time older than the watermark is dropped — the core
  * streaming guarantee (SURVEY §2B.9 Q49) that the single-batch oracle
  * runs can't exercise.
  */
class StreamingSemanticsSpec extends SparkSpec {
  import spark.implicits._

  test("late rows beyond the watermark are dropped across micro-batches") {
    val dir = Files.createTempDirectory("graft_wm").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", StringType)))

    def write(name: String, rows: Seq[(String, String)]): Unit = {
      rows.map { case (t, k) => (java.sql.Timestamp.valueOf(t), k) }
        .toDF("ts", "k")
        .coalesce(1).write.mode("append").parquet(s"$dir/data")
      Thread.sleep(1100) // distinct modification times → deterministic batch order
    }

    // batch 1: an early window + a row that advances the watermark to 10:49
    write("b1", Seq(("2024-01-01 10:00:00", "a"), ("2024-01-01 10:59:00", "b")))
    // batch 2: innocuous row — after this batch the 10:49 watermark is the
    // *previous-batch* watermark that late-event filtering uses (Spark's
    // two-watermark semantics: filter with previous, evict with current)
    write("b2", Seq(("2024-01-01 10:58:00", "c")))
    // batch 3: a LATE row aimed at the closed 10:00 window (10:02 < 10:49
    // → dropped on input) + a fresh row closing the 10:55 window
    write("b3", Seq(("2024-01-01 10:02:00", "late"), ("2024-01-01 11:30:00", "d")))

    val agg = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // one file per micro-batch
      .parquet(s"$dir/data")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("wm_sink")
      .select(date_format($"window.start", "HH:mm").as("w"), $"n")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // closed windows: 10:00 with exactly ONE row (the late 10:02 arrival was
    // dropped on input — not merged, not re-emitted) and 10:55 with the
    // 10:59+10:58 pair; 11:30's window never closed so append never emits it.
    assert(got == Set(("10:00", 1L), ("10:55", 2L)), s"got $got")
    assert(spark.table("wm_sink").count() == 2) // no duplicate emission
  }
}
