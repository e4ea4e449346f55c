package graft.functions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The SORTED DISTINCT 32-bit gram-hash set of a document as
  * `array<long>` — the compact exact-Jaccard operand. Hashing grams to
  * the same first-8-md5-hex-chars values the char-gram MinHash uses
  * shrinks each element from a 5-char string to a long and makes the
  * per-pair intersection a linear merge of sorted longs
  * ([[SortedOverlapCount]]) instead of a string-set operation — the
  * difference between ~1 µs and ~50 µs per candidate pair, which is the
  * whole game when near-dup clusters make the pair set Ω(Σ cluster²).
  * The oracle compares the SAME hashed sets (its MinHash CTE already
  * computes x per gram), so Jaccard-over-hashes is exact on both sides
  * by definition of the shared contract. NULL when the normalised text
  * is shorter than n ([[CharGrams]] semantics).
  */
case class CharGramHashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val norm = CharGramming.normalize(input.asInstanceOf[UTF8String].toString)
    val len = norm.length
    if (len < n) return null
    val md = CharGramHashes.digests.get()
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i <= len - n) {
      set.add(CharGramming.hash32(md, norm.substring(i, i + n))): Unit
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

object CharGramHashes {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def hashes(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      CharGramHashes(GraftExpressionBridge.expression(text), n))
}

/** Intersection cardinality of two SORTED distinct `array<long>` columns
  * by linear merge — O(|a| + |b|), no per-element boxing or hashing.
  * Inputs must be ascending-sorted sets (the [[CharGramHashes]] output
  * contract); result on unsorted input is undefined.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val nx = xs.numElements()
    val ny = ys.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val x = xs.getLong(i)
      val y = ys.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlapCount =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapCount {
  def overlap(a: Column, b: Column): Column =
    GraftExpressionBridge.column(SortedOverlapCount(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
