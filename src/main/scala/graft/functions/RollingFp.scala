package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling-hash fingerprint sketch as ONE per-row expression:
  * tokenize → one md5 per token → k-token polynomial window hashes
  * (base 257 mod 2³¹−1, exact long arithmetic) → the `bottom` smallest
  * window hashes, in a single JVM pass. Replaces the posexplode →
  * per-document window function → sort/collect aggregate, which
  * shuffled one row per token AND ran a per-doc sort to compute a
  * per-document sketch (the [[MinHashSig]]/[[SimHashFp]] shape again).
  *
  * Content contract (identical to the former build and the oracle):
  * tokens = maximal `[a-z0-9]` runs of the lowercased text, in order
  * with repeats; h = first 8 md5 hex chars unsigned; window i hash =
  * (Σ_j h_{i+j}·257^(k−1−j)) mod (2³¹−1); output = (window count,
  * comma-joined ascending `bottom` smallest hashes). NULL when the
  * document has fewer than k tokens (the full-windows-only semantics).
  */
case class RollingFp(child: Expression, k: Int, bottom: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && bottom >= 1)

  override def dataType: DataType = StructType(Seq(
    StructField("n_windows", LongType, nullable = false),
    StructField("fp", StringType, nullable = false)))
  override def nullable: Boolean = true

  private val M = 2147483647L // 2^31 - 1
  // 257^(k-1-j) mod M by square-and-multiply: exact for any k (a raw
  // math.pow loses precision at e >= 8 and a raw Long power overflows).
  private val pows: Array[Long] =
    (0 until k).map(j => RollingFp.powMod(257L, k - 1 - j, M)).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase(Locale.ROOT)
    val toks = new java.util.ArrayList[String]()
    val len = text.length
    var i = 0
    var start = -1
    while (i < len) {
      val c = text.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { toks.add(text.substring(start, i)): Unit; start = -1 }
      i += 1
    }
    if (start >= 0) toks.add(text.substring(start)): Unit
    val m = toks.size
    if (m < k) return null
    val md = RollingFp.digests.get()
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      md.reset()
      val d = md.digest(toks.get(i).getBytes(StandardCharsets.UTF_8))
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val n = m - k + 1
    val rs = new Array[Long](n)
    i = 0
    while (i < n) {
      // Reduce mod M per term: operands stay < 2^31 so each product is
      // < 2^62 and the running value never overflows a Long, keeping the
      // fingerprint non-negative for ANY k (a deferred single % M
      // overflowed — and went negative — once k >= 5). Congruence makes
      // this bit-identical to the former exact-sum formulation for the
      // k values where that one was safe.
      var r = 0L
      var j = 0
      while (j < k) { r = (r + (hs(i + j) % M) * pows(j)) % M; j += 1 }
      rs(i) = r
      i += 1
    }
    java.util.Arrays.sort(rs)
    val take = math.min(bottom, n)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i < take) {
      if (i > 0) sb.append(',')
      sb.append(rs(i)): Unit
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, UTF8String.fromString(sb.toString)))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFp =
    copy(child = newChild)
}

object RollingFp {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  private[functions] def powMod(base: Long, exp: Int, m: Long): Long = {
    var r = 1L
    var b = base % m
    var e = exp
    while (e > 0) {
      if ((e & 1) == 1) r = r * b % m
      b = b * b % m
      e >>= 1
    }
    r
  }

  def fp(text: Column, k: Int, bottom: Int): Column =
    GraftExpressionBridge.column(
      RollingFp(GraftExpressionBridge.expression(text), k, bottom))
}
