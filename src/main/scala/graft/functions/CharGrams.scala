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

/** Character n-gram machinery for n-gram Jaccard near-dup detection, as
  * map-only per-row expressions (the [[MinHashSig]]/[[SimHashFp]] shape:
  * per-document quantities never need a shuffle, so the build fuses into
  * the scan and only the band self-join exchanges data at 100 TB).
  *
  * Shared content contract (mirrored exactly by the DuckDB oracle):
  * norm = lowercased text with every `[^a-z0-9]+` run collapsed to a
  * single space, trimmed; gram i = norm.substring(i, i+n) for
  * 0 <= i <= len-n (grams span word boundaries — the standard char-shingle
  * definition); the gram SET is what Jaccard compares. After
  * normalisation every char is ASCII `[a-z0-9 ]`, so JVM UTF-16 substring
  * and DuckDB codepoint substr agree.
  */
private[functions] object CharGramming {
  /** The shared 32-bit gram-hash: first 8 md5 hex chars as an unsigned
    * value — THE cross-engine contract (DuckDB:
    * `CAST('0x'||substr(md5(g),1,8) AS BIGINT)`). One definition, used by
    * [[CharMinHash]] and [[CharGramHashes]]; a drifted copy would
    * silently break q86/q87 oracle agreement.
    */
  def hash32(md: java.security.MessageDigest, gram: String): Long = {
    md.reset()
    val d = md.digest(gram.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Lowercase, non-alnum runs → single space, trimmed. */
  def normalize(text: String): String = {
    val lower = text.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(lower.length)
    var pendingSpace = false
    var i = 0
    while (i < lower.length) {
      val c = lower.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c): Unit
      } else pendingSpace = true
      i += 1
    }
    sb.toString
  }
}

/** Sorted distinct character n-grams of the normalised text as
  * `array<string>` — the exact-Jaccard operand. NULL when the normalised
  * text is shorter than n (no grams).
  */
case class CharGrams(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n >= 1)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val norm = CharGramming.normalize(input.asInstanceOf[UTF8String].toString)
    val len = norm.length
    if (len < n) return null
    val set = new java.util.TreeSet[String]()
    var i = 0
    while (i <= len - n) { set.add(norm.substring(i, i + n)): Unit; i += 1 }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

/** MinHash signature over the character n-gram set, one pass: gram →
  * first-8-md5-hex-chars unsigned 32-bit hash x → k permutation minima
  * (a_c·x + b_c) mod prime. Duplicate grams cannot change a min, so the
  * multiset pass equals the distinct-set signature exactly. NULL when the
  * normalised text has no grams — same drop semantics as [[CharGrams]],
  * so signature rows and gram rows cover the same documents.
  */
case class CharMinHash(child: Expression, n: Int,
                       as: Seq[Long], bs: Seq[Long], prime: Long)
  extends UnaryExpression with CodegenFallback {
  // Seq fields (not Array): case-class equality must be structural so
  // canonicalization / subexpression elimination / plan reuse see two
  // identical sig() calls as equal expressions.

  require(n >= 1 && as.length == bs.length && as.nonEmpty)

  @transient private lazy val asArr = as.toArray
  @transient private lazy val bsArr = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val norm = CharGramming.normalize(input.asInstanceOf[UTF8String].toString)
    val len = norm.length
    if (len < n) return null
    val md = CharMinHash.digests.get()
    val k = asArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i <= len - n) {
      val x = CharGramming.hash32(md, norm.substring(i, i + n))
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

  override protected def withNewChildInternal(newChild: Expression): CharMinHash =
    copy(child = newChild)
}

object CharGrams {
  def grams(text: Column, n: Int): Column =
    GraftExpressionBridge.column(
      CharGrams(GraftExpressionBridge.expression(text), n))
}

object CharMinHash {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  def sig(text: Column, n: Int, coeffs: Seq[(Long, Long)], prime: Long): Column =
    GraftExpressionBridge.column(CharMinHash(
      GraftExpressionBridge.expression(text), n,
      coeffs.map(_._1), coeffs.map(_._2), prime))
}
