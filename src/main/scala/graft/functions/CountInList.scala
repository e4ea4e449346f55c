package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count of array elements contained in a fixed word list — the native
  * replacement for `size(filter(arr, t => t.isInCollection(words)))`,
  * whose higher-order filter runs an interpreted lambda per element
  * (the [[Tokens]]/[[WordShingles]] wall again; language-ID evaluates
  * FOUR of these per row). Multiplicity-preserving, unlike
  * `array_intersect` (stopword DENSITY needs repeats counted). The word
  * set is hashed once at expression construction.
  */
case class CountInList(child: Expression, words: Seq[String])
  extends UnaryExpression with CodegenFallback {

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.size * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)): Unit)
    s
  }

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var hits = 0
    var i = 0
    while (i < n) {
      if (lookup.contains(arr.getUTF8String(i))) hits += 1
      i += 1
    }
    hits
  }

  override protected def withNewChildInternal(newChild: Expression): CountInList =
    copy(child = newChild)
}

object CountInList {
  def countIn(arr: Column, words: Seq[String]): Column =
    GraftExpressionBridge.column(
      CountInList(GraftExpressionBridge.expression(arr), words))
}
