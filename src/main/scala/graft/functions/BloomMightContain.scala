package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a LONG key column — the runtime
  * semi-join filter primitive. The serialized filter travels as part of
  * the expression (i.e. inside the broadcast task binary, like Spark's
  * own `BloomFilterMightContain` runtime filter), and each executor
  * deserializes it once lazily. `true` may be a false positive (bounded
  * by the build-side fpp); `false` is exact — so a bloom PRUNE followed
  * by the exact join is semantically a no-op that cuts the shuffled
  * volume of the big side to ~|matching keys| at 100 TB.
  *
  * Reference analogue: none (the reference has no joins at all;
  * SURVEY.md §2A "explicitly absent") — this is the §2B.3 scale path.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression with CodegenFallback {

  require(filterBytes.nonEmpty, "empty bloom filter payload")

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain needs an integral key, got ${other.sql}")
    }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(input: Any): Any = {
    val key = input match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    filter.mightContainLong(key)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomMightContain {

  /** Serialize a built filter for embedding into the expression tree. */
  def serialize(bf: BloomFilter): Array[Byte] = {
    val os = new ByteArrayOutputStream()
    bf.writeTo(os)
    os.toByteArray
  }

  def mightContain(key: Column, bf: BloomFilter): Column =
    GraftExpressionBridge.column(
      BloomMightContain(GraftExpressionBridge.expression(key), serialize(bf)))
}
