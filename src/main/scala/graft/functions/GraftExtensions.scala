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
        WordShingles(args.head, intArg(args(1), "word_shingles", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("tokens"),
      new ExpressionInfo(classOf[Tokens].getName, "tokens"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "tokens(text) takes one argument")
        Tokens(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_grams"),
      new ExpressionInfo(classOf[CharGrams].getName, "char_grams"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_grams(text, n) takes text and n")
        CharGrams(args.head, intArg(args(1), "char_grams", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_fp"),
      new ExpressionInfo(classOf[SimHashFp].getName, "simhash_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "simhash_fp(text, bits) takes text and bits")
        SimHashFp(args.head, intArg(args(1), "simhash_fp", "bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(classOf[RollingFp].getName, "rolling_fp"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "rolling_fp(text, k, bottom) takes text, window size and sketch size")
        RollingFp(args.head, intArg(args(1), "rolling_fp", "k"),
          intArg(args(2), "rolling_fp", "bottom"))
      }))
    // report-sized root-sort strategy (conf-gated, default off)
    ext.injectOptimizerRule(_ => graft.plans.SmallResultSort())
  }

  /** A literal/foldable Int argument of a SQL function call. */
  private def intArg(e: Expression, fn: String, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other if other.foldable => other.eval() match {
      case i: Int => i
      case other2 => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an INT literal, got $other2")
    }
    case _ => throw new IllegalArgumentException(
      s"$fn: argument '$name' must be a literal")
  }
}
