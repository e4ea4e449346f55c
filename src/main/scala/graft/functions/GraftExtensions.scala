package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions hook — registers the engine's custom Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT vec_dot(a, b)")`
  * works alongside the Column API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // or
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes two array arguments")
        FloatVecDot(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n) takes text and n")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Int]
        }
        WordShingles(args.head, n)
      }))
    // report-sized root-sort strategy (conf-gated, default off)
    ext.injectOptimizerRule(_ => graft.plans.SmallResultSort())
  }
}
