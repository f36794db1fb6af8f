package graft

import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis._
import graft.operators.TextOps

/** The exploded-aggregate textQuality reformulation computes exactly
  * what the column-HOF metrics compute. */
class TextQualitySpec extends SparkSpecBase {

  test("exploded-aggregate quality metrics equal the column-HOF formulation") {
    val docs = graft.core.Tables(spark, Sf).documents
    val hof = docs
      .withColumn("toks", tokens(col("text")))
      .select(col("doc_id"),
        length(col("text")).as("n_chars_m"),
        size(col("toks")).as("n_tokens"),
        avgTokenLen(col("toks")).as("avg_tok_len"),
        stopwordRatio(col("toks")).as("stopword_ratio"),
        distinctRatio(col("toks")).as("distinct_ratio"),
        punctRatio(col("text")).as("punct_ratio"))
      .orderBy("doc_id").collect().map(_.toSeq)
    val agg = TextOps.textQuality(spark, Sf).collect().map(_.toSeq)
    assert(hof.length == agg.length)
    hof.zip(agg).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }
}
