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
}
