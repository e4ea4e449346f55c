package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column handling — SURVEY.md §2B.11 Q63.
  *
  * Media assets are opaque `binary` columns + typed metadata, read through
  * Spark's `binaryFile` source (path/length/modificationTime/content with
  * content loaded lazily per-row). Decode / feature-extraction runs
  * per-partition so a real decoder would amortise codec init across a
  * partition's rows — the shape `mapInPandas` gives Python pipelines.
  *
  * The decode step itself is a clearly-marked deterministic STUB (no image
  * or audio codecs ship in this environment); the Spark-side plumbing —
  * schema, partition-wise batching, metadata propagation — is real and
  * tested.
  */
object Multimodal {

  /** Typed metadata + features for one decoded asset. */
  case class MediaFeature(
      path: String,
      nBytes: Long,
      kind: String,          // "image" | "audio" | "other" by extension
      // STUB decode output: deterministic pseudo-features from the bytes.
      width: Int, height: Int,
      features: Array[Float])

  /** Read a glob of files as binary rows: (path, modificationTime, length,
    * content). Predicate pushdown on path/length works; content column is
    * only materialised for surviving rows.
    */
  def readBinary(spark: SparkSession, glob: String): DataFrame =
    spark.read.format("binaryFile").load(glob)

  /** Fixed machine-local location of the deterministic binary fixture
    * corpus (versioned — bump when the generation rule changes).
    */
  val fixturesPath: String =
    new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_mm_fixtures_v1").getPath

  /** Generate the q63 oracle corpus: 12 small files with DETERMINISTIC
    * printable-ASCII byte patterns (byte j of file i = (i·7 + j·13) % 64
    * + 48) and mixed media extensions. No codecs involved — the content
    * rule is reproducible by any engine, so metadata + md5 checksums are
    * DuckDB-checkable (`read_blob`). Files are written once,
    * write-if-missing with atomic rename, so concurrent sessions never
    * observe partial files and re-runs are free.
    */
  def ensureFixtures(): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Paths.get(fixturesPath)
    Files.createDirectories(dir)
    for (i <- 0 until 12) {
      val ext = i % 3 match { case 0 => "png"; case 1 => "wav"; case _ => "dat" }
      val target = dir.resolve(f"asset_$i%02d.$ext")
      if (!Files.exists(target)) {
        val n = 101 + 137 * i
        val bytes = Array.tabulate[Byte](n)(j => ((i * 7 + j * 13) % 64 + 48).toByte)
        val tmp = Files.createTempFile(dir, ".asset", ".tmp")
        Files.write(tmp, bytes)
        try Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
        catch { // another session committed first — identical bytes, keep theirs
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.deleteIfExists(tmp): Unit
        }
      }
    }
    fixturesPath
  }

  private def kindOf(path: String): String = {
    val p = path.toLowerCase
    if (p.endsWith(".png") || p.endsWith(".jpg") || p.endsWith(".jpeg")) "image"
    else if (p.endsWith(".wav") || p.endsWith(".mp3") || p.endsWith(".flac")) "audio"
    else "other"
  }

  /** STUB decode: a real implementation would decode the codec here
    * (per-partition, so codec state is reused across rows). This fake is
    * deterministic in the byte content: "dimensions" from the byte length,
    * 8 pseudo-features from a rolling byte hash. Marked STUB by contract.
    */
  private def stubDecode(path: String, content: Array[Byte]): MediaFeature = {
    val n = content.length
    // STUB: pretend dimensions derive from the payload size
    val w = math.max(1, (n % 1920).toInt)
    val h = math.max(1, (n % 1080).toInt)
    val feats = new Array[Float](8)
    var acc = 17L
    var i = 0
    while (i < n) {
      acc = acc * 31 + (content(i) & 0xff)
      feats(i % 8) += ((acc % 1000).toFloat / 1000.0f)
      i += 1
    }
    MediaFeature(path, n.toLong, kindOf(path), w, h, feats)
  }

  /** Partition-wise "decode" of a binary frame into typed features.
    * Batch shape: one iterator per partition (codec init once per
    * partition, like a Pandas-UDF batch).
    */
  def extractFeatures(binary: DataFrame): Dataset[MediaFeature] = {
    val spark = binary.sparkSession
    import spark.implicits._
    binary.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition init would go here (codec/decoder handles)
        rows.map { case (path, content) => stubDecode(path, content) }
      }
  }

  /** Split binary payloads into fixed-size chunk rows
    * (`key, chunk_idx, n_chunks, chunk`). At 100 TB a single media asset
    * can exceed comfortable row/shuffle-block sizes; chunk rows hash-
    * partition evenly, stream through shuffles, and let downstream stages
    * (per-frame sampling, range requests) address byte ranges without
    * materialising whole assets. Pure-`Column` (sequence + posexplode +
    * binary substring) — no UDF.
    */
  def chunkBinary(df: DataFrame, keyCol: String, contentCol: String,
                  chunkSize: Int): DataFrame = {
    require(chunkSize > 0)
    df.select(col(keyCol).as("key"), col(contentCol).as("__c"))
      .withColumn("n_chunks",
        greatest(ceil(length(col("__c")).cast("double") / chunkSize).cast("int"), lit(1)))
      .select(col("key"), col("n_chunks"), col("__c"),
        explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("key"), col("chunk_idx"), col("n_chunks"),
        expr(s"substring(__c, chunk_idx * $chunkSize + 1, $chunkSize)").as("chunk"))
  }

  /** Reassemble [[chunkBinary]] rows back into whole payloads (one
    * shuffle on the key; order restored from chunk_idx).
    */
  def reassemble(chunks: DataFrame): DataFrame =
    chunks.groupBy(col("key"))
      .agg(aggregate(
        transform(
          sort_array(collect_list(struct(col("chunk_idx"), col("chunk")))),
          s => s.getField("chunk")),
        lit(Array.emptyByteArray),
        (acc, c) => concat(acc, c)).as("content"))

  /** Frame sampling over [[chunkBinary]] rows: with fixed-size frames one
    * chunk = one frame, so "every `stride`-th frame starting at `offset`"
    * is a pure filter on chunk_idx — it prunes (stride−1)/stride of the
    * bytes BEFORE any decode or shuffle touches them, which is the whole
    * point of sampling at 100 TB.
    */
  def frameSample(chunks: DataFrame, stride: Int, offset: Int = 0): DataFrame = {
    require(stride > 0 && offset >= 0)
    chunks.filter(pmod(col("chunk_idx") - offset, lit(stride)) === 0 &&
      col("chunk_idx") >= offset)
  }

  /** STUB resize: a real implementation would decode, scale to
    * (targetW, targetH) and re-encode per partition. The stub keeps the
    * real pipeline shape — per-partition batching over (key, payload) —
    * and deterministically "scales" the fake features by the area ratio.
    */
  def resizeFeatures(feats: Dataset[MediaFeature], targetW: Int,
                     targetH: Int): Dataset[MediaFeature] = {
    val spark = feats.sparkSession
    import spark.implicits._
    feats.mapPartitions { rows =>
      // per-partition init of the (stub) scaler would go here
      rows.map { f =>
        val ratio =
          (targetW.toLong * targetH).toFloat / (f.width.toLong * f.height)
        f.copy(width = targetW, height = targetH,
          features = f.features.map(_ * ratio))
      }
    }
  }
}
