package graft.functions

import java.nio.charset.StandardCharsets
import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole MinHash signature as ONE per-row expression: tokenize →
  * word-n-gram shingles → portable 32-bit hash → k permutation minima,
  * all in a single pass of plain JVM code. Replaces the relational
  * explode(shingles) → distinct → hash-aggregate build, which shuffled
  * one row PER SHINGLE (~500× the corpus row count) before reducing —
  * the signature is a per-document quantity and never needed a shuffle.
  * At 100 TB this turns the MinHash build from the pipeline's largest
  * shuffle into a map-only projection; only the band self-join shuffles.
  *
  * Content contract (identical to the oracle and the previous pipeline):
  * tokens = maximal `[a-z0-9]` runs of the lowercased text; shingle i =
  * n consecutive tokens joined by spaces; x = first 8 md5 hex chars of
  * the shingle as an unsigned 32-bit value; h_c = min over shingles of
  * (a_c·x + b_c) mod prime. Duplicate shingles don't change a min, so
  * skipping the distinct step is exact. NULL when the document has
  * fewer than n tokens (the explode-drop semantics).
  */
case class MinHashSig(child: Expression, n: Int,
                      as: Seq[Long], bs: Seq[Long], prime: Long)
  extends UnaryExpression with CodegenFallback {
  // Seq fields (not Array): structural case-class equality keeps
  // canonicalization / subexpression elimination / plan reuse working.

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

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
    if (m < n) return null
    val md = MinHashSig.digests.get()
    val k = asArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    i = 0
    while (i <= m - n) {
      sb.setLength(0)
      sb.append(toks.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val x = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var c = 0
      while (c < k) {
        val h = (asArr(c) * x + bsArr(c)) % prime
        if (h < mins(c)) mins(c) = h
        c += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def sig(text: Column, n: Int, coeffs: Seq[(Long, Long)], prime: Long): Column =
    GraftExpressionBridge.column(MinHashSig(
      GraftExpressionBridge.expression(text), n,
      coeffs.map(_._1), coeffs.map(_._2), prime))
}
