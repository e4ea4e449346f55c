package graft

/** The SparkSessionExtensions registration path: custom expressions
  * callable from SQL text (the shared session installs
  * [[graft.functions.GraftExtensions]] at build time).
  */
class ExtensionsSpec extends SparkSpec {

  test("vec_dot and word_shingles are callable from spark.sql") {
    val dot = spark.sql(
      "SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d")
      .head().getDouble(0)
    assert(dot == 11.0)
    val sh = spark.sql(
      "SELECT word_shingles('the quick brown fox', 3) AS s")
      .head().getSeq[String](0)
    assert(sh == Seq("the quick brown", "quick brown fox"))
  }

  test("native Tokens ≡ the HOF filter(split(lower)) formulation on arbitrary text") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import spark.implicits._
    val weird = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(
        Gen.alphaNumChar.map(_.toString), Gen.const(" "), Gen.const("\t"),
        Gen.const("é"), Gen.const("中"), Gen.const("𝕏"),
        Gen.const("!"), Gen.const("Ü"))).map(_.mkString))
    val supp = "𝕏" // 𝕏 (U+1D54F, outside the BMP)
    val samples = (1 to 80).flatMap(_ => weird.sample) :+
      "" :+ "  " :+ "a" :+ "Hello, WORLD!  42x " :+ s"$supp$supp mixed${supp}runs7"
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "t")
      .select($"id",
        graft.ops.TextOps.tokens($"t").as("native"),
        filter(split(lower($"t"), "[^a-z0-9]+"), x => x =!= "").as("hof"))
    val bad = df.filter(not($"native" <=> $"hof")).collect()
    assert(bad.isEmpty, s"Tokens mismatch on ${bad.take(3).mkString("; ")}")
  }

  test("native CountInList ≡ size(filter(isInCollection)) incl. multiplicity") {
    import org.apache.spark.sql.functions._
    import org.scalacheck.Gen
    import spark.implicits._
    val words = Seq("the", "a", "of", "and", "is")
    val tokGen = Gen.listOf(Gen.oneOf(
      Gen.oneOf(words), Gen.alphaLowerStr.suchThat(_.nonEmpty)))
    val samples = (1 to 80).flatMap(_ => tokGen.sample) :+
      List() :+ List("the", "the", "the") :+ List("THE")
    val df = samples.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "toks")
      .select($"id",
        graft.functions.CountInList.countIn($"toks", words).as("native"),
        size(filter($"toks", t => t.isInCollection(words))).as("hof"))
    val bad = df.filter($"native" =!= $"hof").collect()
    assert(bad.isEmpty, s"CountInList mismatch: ${bad.take(3).mkString("; ")}")
  }
}
