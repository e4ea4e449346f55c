package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-extension surface — SURVEY.md §2B.10 (Q54–Q56).
  *
  * The analogue of Fossa running arbitrary model code
  * (control/process.py:99-100), but typed and Catalyst-visible:
  * scalar UDFs, a typed `Aggregator` UDAF, and typed flatMap generators.
  * UDFs are a last resort in this engine (built-ins are codegen'd; UDFs
  * box) — these exist to prove the extension points, and the oracle gate
  * proves their results.
  */
object Udx {

  /** Q54 scalar UDF body: price per size unit, 6-dp rounded. Deterministic
    * double math — bit-identical to the oracle's SQL expression.
    */
  val priceDensity: (Double, Int) => Double =
    (price, size) => BigDecimal(price / (size + 1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Q55 UDAF: order-insensitive XOR fold of 64-bit values (sketch-style
    * binary state; commutative+associative so partial aggregation on the
    * map side is exact).
    */
  object XorAgg extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(b: Long, a: Long): Long = b ^ a
    override def merge(b1: Long, b2: Long): Long = b1 ^ b2
    override def finish(r: Long): Long = r
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Q56 generator body: token stream with 1-based positions (a typed
    * flatMap — the Dataset-native UDTF shape).
    */
  def tokenize(id: Long, text: String): Seq[(Long, Int, String)] =
    text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      .zipWithIndex.map { case (tok, i) => (id, i + 1, tok) }.toSeq
}
