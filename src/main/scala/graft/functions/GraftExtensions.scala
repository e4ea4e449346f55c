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
    // the dedup-pipeline expressions: SQL text and the Column API build
    // the IDENTICAL Catalyst trees, so a pipeline written as spark.sql
    // hash-matches its DataFrame twin (q152 proves it end-to-end). The
    // minhash permutation bank is the engine's fixed (a,b,prime) contract
    // (graft.ops.MinHashDedup.coeffs) — the same constants the oracles
    // unroll, so SQL-entry users get oracle-compatible signatures without
    // threading 17 literals through every call.
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig(text, n) takes text and shingle n")
        MinHashSig(args.head, intArg(args(1), "minhash_sig", "n"),
          graft.ops.MinHashDedup.coeffs.map(_._1),
          graft.ops.MinHashDedup.coeffs.map(_._2),
          graft.ops.MinHashDedup.prime)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_minhash"),
      new ExpressionInfo(classOf[CharMinHash].getName, "char_minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "char_minhash(text, n) takes text and gram n")
        CharMinHash(args.head, intArg(args(1), "char_minhash", "n"),
          graft.ops.MinHashDedup.coeffs.map(_._1),
          graft.ops.MinHashDedup.coeffs.map(_._2),
          graft.ops.MinHashDedup.prime)
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_gram_hashes"),
      new ExpressionInfo(classOf[CharGramHashes].getName, "char_gram_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "char_gram_hashes(text, n) takes text and gram n")
        CharGramHashes(args.head, intArg(args(1), "char_gram_hashes", "n"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("sorted_overlap"),
      new ExpressionInfo(classOf[SortedOverlapCount].getName, "sorted_overlap"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "sorted_overlap(a, b) takes two sorted array<long> arguments")
        SortedOverlapCount(args.head, args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("count_in_list"),
      new ExpressionInfo(classOf[CountInList].getName, "count_in_list"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "count_in_list(tokens, words) takes a token array and a literal word array")
        CountInList(args.head, stringArrayArg(args(1), "count_in_list", "words"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "bloom_might_contain(key, filter) takes a key and a literal binary filter")
        BloomMightContain(args.head,
          binaryArg(args(1), "bloom_might_contain", "filter"))
      }))
    // report-sized root-sort strategy (conf-gated, default off)
    ext.injectOptimizerRule(_ => graft.plans.SmallResultSort())
  }

  /** A literal/foldable array<string> argument of a SQL function call. */
  private def stringArrayArg(e: Expression, fn: String,
      name: String): Seq[String] = {
    require(e.foldable,
      s"$fn: argument '$name' must be a literal array of strings")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map { i =>
          val v = a.get(i, org.apache.spark.sql.types.StringType)
          // explicit: a NULL slot would otherwise surface as an opaque
          // resolution-time NPE instead of this function's own error
          require(v != null,
            s"$fn: argument '$name' must not contain NULL elements")
          v.toString
        }
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be an array of strings, got $other")
    }
  }

  /** A literal/foldable binary argument of a SQL function call. */
  private def binaryArg(e: Expression, fn: String, name: String): Array[Byte] = {
    require(e.foldable, s"$fn: argument '$name' must be a binary literal")
    e.eval() match {
      case b: Array[Byte] => b
      case other => throw new IllegalArgumentException(
        s"$fn: argument '$name' must be binary, got $other")
    }
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
