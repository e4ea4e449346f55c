package graft.tools
// Temporary profiling scratchpad (removed before round end).
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.MinHashDedup
object Probe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.graft.smallResultSort","true")
      .config("spark.graft.compactScans","true")
      .config("spark.ui.enabled","false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.core.Tables.t(spark, "/root/testdata/sf0.1", "documents")
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(f: => Unit): Unit = { f; f; val t0=System.nanoTime(); f; f; f; println(f"PROBE $tag ${(System.nanoTime()-t0)/3e9}%.3f s") }

    // variant B: broadcast gram index into the verify joins
    val sig = graft.functions.CharMinHash.sig(col("text"), 5, MinHashDedup.coeffs, MinHashDedup.prime)
    val sigs = docs.select(col("doc_id"), sig.as("__sig")).filter(col("__sig").isNotNull)
    val nBands = MinHashDedup.coeffs.size / 2
    val bandStructs = (0 until nBands).map { b =>
      val key = md5(concat_ws("_", (0 until 2).map(r => element_at(col("__sig"), b * 2 + r + 1)): _*))
      struct(lit(b).as("band"), key.as("bh"))
    }
    val bands = sigs.select(col("doc_id"), explode(array(bandStructs: _*)).as("__b"))
      .select(col("doc_id"), col("__b.band").as("band"), col("__b.bh").as("bh"))
    val cand = bands.select(col("band"), col("bh"), col("doc_id").as("d1"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("d2")), Seq("band", "bh"))
      .filter(col("d1") < col("d2")).select(col("d1"), col("d2")).distinct()
    val grams = docs.select(col("doc_id"), graft.functions.CharGramHashes.hashes(col("text"), 5).as("__g"))
      .filter(col("__g").isNotNull)
    val overlap = graft.functions.SortedOverlapCount.overlap(col("g1"), col("g2"))
    time("sig_only") { noop(sigs) }
    time("bands_only") { noop(bands) }
    val sj = bands.select(col("band"), col("bh"), col("doc_id").as("d1"))
      .join(bands.select(col("band"), col("bh"), col("doc_id").as("d2")), Seq("band", "bh"))
      .filter(col("d1") < col("d2")).select(col("d1"), col("d2"))
    time("selfjoin_nodistinct") { noop(sj) }
    time("cand_with_distinct") { noop(cand) }
    val grams2 = grams
    time("grams_only") { noop(grams2) }
    spark.stop()
  }
}
