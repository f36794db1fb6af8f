package graft

class PipelinePackSpec extends SparkSpecBase {
  test("pipeline_pack matches a sequential reference pack per source") {
    val got = graft.operators.TextOps.pipelinePack(spark, Sf, budget = 512)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // reference: walk docs in (source, doc_id) order, cut a new pack
    // whenever the running total passes the budget boundary
    val docs = graft.core.Tables(spark, Sf).documents
      .selectExpr("source", "doc_id",
        "CAST(size(split(trim(text), '\\\\s+')) AS LONG) AS n")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(d => (d._1, d._2))
    val want = docs.groupBy(_._1).flatMap { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._2).map { case (_, id, n) =>
        val pack = cum / 512; cum += n; (src, pack, id, n)
      }.groupBy(t => (t._1, t._2)).map { case ((s, p), rows) =>
        (s, p) -> (rows.size.toLong, rows.map(_._4).sum,
          rows.map(_._3).min, rows.map(_._3).max)
      }
    }.toMap
    assert(got == want)
    assert(got.nonEmpty)
    // doc-id ranges of consecutive packs never overlap within a source
    got.keys.groupBy(_._1).foreach { case (src, ks) =>
      val ordered = ks.toSeq.sortBy(_._2).map(got)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 < b._3, s"$src packs overlap")
        case _ =>
      }
    }
  }
}

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
