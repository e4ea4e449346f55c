package graft.functions

import java.util.Locale
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native word tokenizer — replaces the
  * `filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")`
  * higher-order-function formulation, whose interpreted per-element
  * lambda dominates every text query's hot loop (the same ~25k evals/s
  * wall [[WordShingles]] hit). One pass of plain JVM string code per
  * row: lowercase once, then emit each maximal `[a-z0-9]` run.
  *
  * Content contract (must match the DuckDB oracle exactly): tokens =
  * lowercased text split on `[^a-z0-9]+` with empties dropped — i.e.
  * the maximal alphanumeric runs, in order, repeats kept. Surrogate
  * pairs and all non-ASCII characters are separators under both
  * formulations, so the outputs are identical.
  */
case class Tokens(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase(Locale.ROOT)
    val n = text.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    var start = -1
    while (i < n) {
      val c = text.charAt(i)
      val alnum = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
      if (alnum) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromString(text.substring(start, i)))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromString(text.substring(start)))
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  def tokens(text: Column): Column =
    GraftExpressionBridge.column(Tokens(GraftExpressionBridge.expression(text)))
}
