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

  /** Dot product of two float/double array columns — the codegen'd native
    * expression [[graft.functions.FloatVecDot]] (bit-identical to the
    * interpreted HOF fold it replaced, ~40× faster per pair).
    */
  def dot(a: Column, b: Column): Column = graft.functions.FloatVecDot.dot(a, b)

  /** L2 norm of a float/double array column. */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity of two float-array columns (double math). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

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
    // norms computed once per row here, not once per pair in the join
    val p = probes.select(col(idCol).as("probe_id"), col(vecCol).as("__pv"),
      norm(col(vecCol)).as("__pn"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"))
    val scored = p.join(c, col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
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
      norm(col(vecCol)).as("__pn"), lshBucket(col(vecCol), bits).as("__bkt"))
    val c = corpus.select(col(idCol).as("cand_id"), col(vecCol).as("__cv"),
      norm(col(vecCol)).as("__cn"), lshBucket(col(vecCol), bits).as("__bkt"))
    val scored = p.join(c, Seq("__bkt"))
      .filter(col("probe_id") =!= col("cand_id"))
      .withColumn("cos6",
        round(dot(col("__pv"), col("__cv")) / (col("__pn") * col("__cn")), 6))
    TopK.perGroup(scored, k,
        partition = Seq(col("probe_id")),
        order = Seq(col("cos6").desc, col("cand_id").asc))
      .select(col("probe_id"), col("__bkt").as("bucket"), col("cand_id"),
        col("cos6"), col("rn"))
  }
}
