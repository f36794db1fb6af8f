package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, SketchAggs}
import graft.functions.Shingles

/** The imperative sketch aggregates are bit-compatible with their
  * declarative multi-column formulations (same [[PortableHash]]
  * family the DuckDB oracle reproduces). */
class SketchAggsSpec extends SparkSpecBase {

  private lazy val hashes = graft.core.Tables(spark, Sf).documents
    .select(col("doc_id"), Shingles.grams3(col("text")).as("grams"))
    .select(col("doc_id"), explode(col("grams")).as("gram"))
    .select(col("doc_id"), PortableHash.h60(col("gram")).as("h"))

  test("MinHashAgg equals k separate min((a_i*h + b_i) mod P) columns") {
    val k = 32
    val (as, bs) = PortableHash.affineParams(k)
    val imperative = hashes.groupBy("doc_id")
      .agg(SketchAggs.minhashAgg(col("h"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val declarative = hashes.groupBy("doc_id")
      .agg(min(PortableHash.salted(col("h"), as(0), bs(0))).as("m0"),
        (1 until k).map(i =>
          min(PortableHash.salted(col("h"), as(i), bs(i))).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1)).toSeq).toMap
    assert(imperative == declarative)
    assert(imperative.nonEmpty)
  }

  test("SimHashAgg equals the 64-column sum-of-votes formulation") {
    def vote(j: Int) =
      when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))
    val votes = hashes.groupBy("doc_id")
      .agg(sum(vote(0)).as("b0"), (1 until 64).map(j => sum(vote(j)).as(s"b$j")): _*)
    val packed = (0 until 64).map(j =>
      shiftleft(when(col(s"b$j") > 0, lit(1L)).otherwise(lit(0L)), j))
      .reduce(_ bitwiseOR _)
    val declarative = votes.select(col("doc_id"), packed.as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val imperative = hashes.groupBy("doc_id")
      .agg(SketchAggs.simhashAgg(col("h")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(imperative == declarative)
  }

  test("CountMinAgg: row mass = token count; estimates never under-count") {
    val depth = 4
    val width = 64
    val n = hashes.count()
    val cms = hashes
      .agg(SketchAggs.countMinAgg(col("h"), depth, width).as("cms"))
      .head().getSeq[Long](0)
    assert(cms.length == depth * width)
    // every row of the matrix absorbs each input token exactly once
    (0 until depth).foreach { i =>
      assert(cms.slice(i * width, (i + 1) * width).sum == n)
    }
    // CMS one-sided error: estimate >= exact count, for every word
    val rows = graft.operators.TextMR.cmsFreq(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < cnt ${r.getLong(1)}")
    }
    // with 31 distinct words in 64 buckets, some word must collide in
    // at least one row yet still resolve exactly through the min —
    // assert the sketch is actually exercised (not all-identity)
    assert(rows.map(_.getLong(1)).sum == spark.read
      .parquet(s"$Sf/documents.parquet")
      .select(explode(graft.functions.TokenCol.letterTokens(col("text"))))
      .count())
  }

  test("countmin_agg is callable from SQL") {
    GraftFunctions.register(spark)
    graft.core.Tables(spark, Sf).documents.createOrReplaceTempView("docs_cms")
    val r = spark.sql(
      """SELECT countmin_agg(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT), 4, 64) AS m
         FROM (SELECT explode(ascii_tokens(text)) AS w FROM docs_cms)""")
      .head().getSeq[Long](0)
    assert(r.length == 256 && r.sum > 0)
  }
}
