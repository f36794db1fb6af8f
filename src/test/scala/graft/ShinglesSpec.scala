package graft

import org.apache.spark.sql.functions._

import graft.functions.Shingles

/** The codegen'd shingle expression matches the interpreted HOF
  * formulation (set equality — distinct-order may differ). */
class ShinglesSpec extends SparkSpecBase {
  import spark.implicits._

  test("NGramShingles matches the HOF reference on documents") {
    val docs = graft.core.Tables(spark, Sf).documents
    val diff = docs.select(
        Shingles.grams3(col("text")).as("fast"),
        Shingles.grams3Hof(col("text")).as("ref"))
      .filter(size(array_except(col("fast"), col("ref"))) > 0 ||
        size(array_except(col("ref"), col("fast"))) > 0)
      .count()
    assert(diff == 0)
  }

  test("HOF minhash signature and band keys are deterministic and well-shaped") {
    val docs = graft.core.Tables(spark, Sf).documents.limit(20)
    val sig = docs.select(
      Shingles.bandKeys(
        Shingles.minhashSignature(Shingles.grams3(col("text")), 32), 8, 4)
        .as("bks"))
    val a = sig.collect().map(_.getSeq[String](0))
    val b = sig.collect().map(_.getSeq[String](0))
    assert(a.zip(b).forall(p => p._1 == p._2))
    assert(a.forall(_.length == 8))
    assert(a.forall(_.zipWithIndex.forall { case (k, i) => k.startsWith(s"$i#") }))
  }

  test("degenerate short docs produce one whole-text shingle") {
    val out = Seq("one two", "a", "").toDF("text")
      .select(Shingles.grams3(col("text")).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("one two"))
    assert(out(1) == Seq("a"))
  }
}
