package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WINNOWING fingerprints (Schleimer, Wilkerson & Aiken 2003 — the MOSS
  * algorithm) of the normalised text: a positional hash of every k-char
  * window, then the MINIMUM hash of each w-wide hash window, emitted as
  * the sorted DISTINCT fingerprint set (`array<long>`). Map-only, one
  * pass, O(n) via a monotonic deque — the winnowing happens INSIDE the
  * expression, so the postings pipeline never pays a per-doc sort/window
  * shuffle.
  *
  * GUARANTEE (the reason winnowing beats sampling): two documents
  * sharing a verbatim normalised substring of length ≥ k + w - 1 share
  * at least one fingerprint — the shared stretch contains a full hash
  * window, and identical hash windows have identical minima. NULL when
  * the normalised text is shorter than k + w - 1 (no full window).
  *
  * Hash = [[CharGramming.hash32]] (first 4 md5 bytes of the window,
  * unsigned) over [[CharGramming.normalize]]d text — both already
  * replayed by the q86-family oracles, so the DuckDB side reproduces
  * positions, window minima and the distinct set exactly.
  */
case class WinnowedFps(child: Expression, k: Int, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val norm = CharGramming.normalize(input.asInstanceOf[UTF8String].toString)
    val len = norm.length
    if (len < k + w - 1) return null
    val md = WinnowedFps.digests.get()
    val nh = len - k + 1
    val hs = new Array[Long](nh)
    var i = 0
    while (i < nh) {
      hs(i) = CharGramming.hash32(md, norm.substring(i, i + k)); i += 1
    }
    val fps = new java.util.TreeSet[java.lang.Long]()
    // sliding-window minimum: monotonic deque of indices, values
    // strictly increasing front→back (ties pop, which only moves the
    // minimum's INDEX — the emitted minimum VALUE matches SQL MIN())
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // live deque is dq[head, tail)
    i = 0
    while (i < nh) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i; tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) fps.add(hs(dq(head))): Unit
      i += 1
    }
    val out = new Array[Any](fps.size)
    val it = fps.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowedFps =
    copy(child = newChild)
}

object WinnowedFps {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def fps(text: Column, k: Int, w: Int): Column =
    GraftExpressionBridge.column(
      WinnowedFps(GraftExpressionBridge.expression(text), k, w))
}
