package graft

import org.apache.spark.sql.functions.col

import graft.operators.TextOps

/** Stopword-profile language ID on crafted samples (the synthetic
  * corpus' lang labels are uncorrelated with its text, so accuracy is
  * asserted here instead of against the table). */
class LangidSpec extends SparkSpecBase {
  import spark.implicits._

  test("predicts the language of crafted sentences") {
    val samples = Seq(
      ("en", "the cat sat on the mat and it is happy with the sun"),
      ("es", "el perro corre por la calle y los gatos duermen en las casas del pueblo"),
      ("fr", "le chien court dans les rues et les chats dorment dans un jardin du village"),
      ("de", "der hund läuft durch die straße und die katzen schlafen in das haus mit ein"),
    ).toDF("expected", "text")
    val out = samples
      .select(col("expected"), TextOps.langidScores(col("text")).getField("lang").as("pred"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"expected ${r.getString(0)} got ${r.getString(1)}"))
  }

  test("join-based textLangid agrees with the column-expression scorer") {
    val joined = TextOps.textLangid(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val hof = graft.core.Tables(spark, Sf).documents
      .select(col("doc_id"), TextOps.langidScores(col("text")).as("p"))
      .select(col("doc_id"), col("p.lang"),
        org.apache.spark.sql.functions.round(col("p.score"), 6))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(joined == hof)
  }

  test("langid over documents is deterministic and total") {
    val a = TextOps.textLangid(spark, Sf).collect()
    val b = TextOps.textLangid(spark, Sf).collect()
    assert(a.sameElements(b))
    assert(a.length == graft.core.Tables(spark, Sf).documents.count())
  }
}
