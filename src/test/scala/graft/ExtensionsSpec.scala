package graft

/** The custom expressions are reachable from plain SQL once
  * registered. */
class ExtensionsSpec extends SparkSpecBase {

  test("cosine_sim and ngram_shingles work from spark.sql") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      "SELECT cosine_sim(array(CAST(1 AS FLOAT), CAST(0 AS FLOAT)), " +
        "array(CAST(1 AS FLOAT), CAST(0 AS FLOAT))) AS c")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val grams = spark.sql(
      "SELECT ngram_shingles(split('a b c d', ' '), 3) AS g")
      .head().getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))

    val toks = spark.sql(
      "SELECT ascii_tokens('He said: ta''en 42 times!', true) AS t")
      .head().getSeq[String](0)
    assert(toks == Seq("He", "said", "ta", "en", "42", "times"))
    val letters = spark.sql(
      "SELECT ascii_tokens('He said: 42') AS t").head().getSeq[String](0)
    assert(letters == Seq("He", "said"))
  }

  test("ngram_shingles rejects a non-literal n") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT ngram_shingles(split('a b', ' '), CAST(id AS INT)) FROM range(1)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") ||
      e.getMessage.contains("ngram_shingles"))
  }
}
