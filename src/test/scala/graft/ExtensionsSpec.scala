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
}
