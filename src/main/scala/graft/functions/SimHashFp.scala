package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole SimHash fingerprint as ONE per-row expression: tokenize →
  * distinct token set → one md5 per token → `bits` signed bit-sums →
  * sign fingerprint, in a single JVM pass. Replaces the relational
  * explode(tokenSet) → `bits`-way sum aggregate, which shuffled one row
  * per distinct token to compute a per-document quantity (the same
  * never-needed-a-shuffle shape [[MinHashSig]] removed for MinHash).
  *
  * Content contract (identical to the former build and the oracle):
  * tokens = maximal `[a-z0-9]` runs of the lowercased text, DISTINCT
  * (set semantics — SimHash is multiplicity-insensitive); x = first 8
  * md5 hex chars as unsigned 32-bit; bit i of the fingerprint is set
  * iff Σ over distinct tokens of (±1 by bit i of x) is > 0. NULL when
  * the document has no tokens (the explode-drop semantics).
  */
case class SimHashFp(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 32, "fp must fit a non-negative long: bits in [1,32]")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase(Locale.ROOT)
    val seen = new java.util.HashSet[String]()
    val sums = new Array[Int](bits)
    val md = SimHashFp.digests.get()
    val len = text.length
    var any = false
    var i = 0
    var start = -1
    def emit(tok: String): Unit = if (seen.add(tok)) {
      any = true
      md.reset()
      val d = md.digest(tok.getBytes(StandardCharsets.UTF_8))
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var b = 0
      while (b < bits) {
        sums(b) += (if (((x >> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    while (i < len) {
      val c = text.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) { emit(text.substring(start, i)); start = -1 }
      i += 1
    }
    if (start >= 0) emit(text.substring(start))
    if (!any) return null
    var fp = 0L
    var b = 0
    while (b < bits) { if (sums(b) > 0) fp |= 1L << b; b += 1 }
    fp
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashFp =
    copy(child = newChild)
}

object SimHashFp {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def fp(text: Column, bits: Int): Column =
    GraftExpressionBridge.column(
      SimHashFp(GraftExpressionBridge.expression(text), bits))
}
