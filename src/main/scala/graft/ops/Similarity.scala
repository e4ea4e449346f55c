package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Embedding similarity search — SURVEY.md §2B.11 Q61 and the ANN
  * training-data addition.
  *
  * Cosine is a pure-`Column` left-to-right fold (bit-identical to the
  * oracle's `list_dot_product` on DOUBLE lists — verified empirically), so
  * it stays inside codegen; no UDF.
  *
  * Scale path: [[bruteForceTopK]] is O(|probes|·|corpus|) — fine for a
  * bounded probe set; [[lshBucket]] hash-partitions the corpus by
  * sign-bit buckets so each probe only scans its bucket (candidate set
  * ~corpus/2^bits), the standard random-hyperplane LSH shape. A real IVF
  * variant swaps the bucket fn for learned centroids; the join/partition
  * plumbing is identical.
  */
object Similarity {

  /** Elementwise-double copy of a float-array column. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Sequential-fold dot product of two double-array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }

  /** Sign-bit LSH bucket from the first `bits` dimensions (fixed axis
    * hyperplanes — deterministic and oracle-portable; swap in fixed random
    * hyperplane dot-signs for better isotropy on real data).
    */
  def lshBucket(v: Column, bits: Int = 4): Column =
    (0 until bits).map { i =>
      when(element_at(v, i + 1) > 0f, lit(1L << (bits - 1 - i))).otherwise(0L)
    }.reduce(_ + _)

  /** Brute-force cosine top-k: every probe row scored against the whole
    * corpus. `probes`/`corpus` must have (`idCol`, `vecCol`).
    */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"))
    val scored = p.join(c, col("probe_id") =!= col("cand_id"))
      .withColumn("cos6", round(cosine(col("__pv"), col("__cv")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("cand_id"), col("cos6"), col("rn"))
  }

  /** LSH-bucketed cosine top-k: probes only scan corpus rows in their own
    * sign-bit bucket — the scan per probe shrinks ~2^bits-fold.
    */
  def lshTopK(probes: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 4): DataFrame = {
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
      lshBucket(col(vecCol), bits).as("__bkt"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      lshBucket(col(vecCol), bits).as("__bkt"))
    val scored = p.join(c, Seq("__bkt"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6", round(cosine(col("__pv"), col("__cv")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("__bkt").as("bucket"), col("cand_id"),
        col("cos6"), col("rn"))
  }
}
