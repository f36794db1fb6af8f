package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.TextOps

/** Equivalence proof for the [[graft.functions.BpeEncode]] kernel:
  * the rank-barrier priority merge must reproduce the sequential
  * literal-`replace` fold (the oracle's formulation) exactly — on
  * learned tables from dense tiny-alphabet corpora, AND on the two
  * crafted tables where a naive priority encode diverges (an
  * earlier-rank pair recreated by a later merge's output-string
  * collision, and a pair the trajectory learned twice). Plus the
  * scale tripwire: the encode plan must not grow with the merge
  * count. */
class BpeEncodeSpec extends SparkSpecBase {
  import spark.implicits._

  private def both(words: Seq[String], merges: Seq[(String, String)])
      : (Seq[String], Seq[String]) = {
    val bc = spark.sparkContext.broadcast(merges.toArray)
    val df = words.toDF("word")
    val kernel = df.select(Bpe.encode(col("word"), bc).as("e"))
      .collect().map(_.getString(0)).toSeq
    val fold = df.select(TextOps.bpeFoldEncode(col("word"), merges).as("e"))
      .collect().map(_.getString(0)).toSeq
    (kernel, fold)
  }

  test("kernel == fold on learned tables over dense random corpora") {
    val rnd = new Random(20260815L)
    for (trial <- 1 to 6) {
      val words = Seq.fill(40)(
        (1 to (1 + rnd.nextInt(7))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString).distinct
      val types = words.groupBy(identity).toArray
        .map { case (w, g) => (w, g.size.toLong) }
      val merges = TextOps.bpeLearnLocal(types, rounds = 10)
        .map(m => (m._2, m._3))
      val (kernel, fold) = both(words, merges)
      assert(kernel == fold,
        s"trial $trial diverged:\n$kernel\n$fold\nmerges $merges")
    }
  }

  test("collision: a later merge recreating an earlier merge's element stays unmerged") {
    // rank 1 = (xy, z); rank 2 = (x, y) whose output "xy" collides
    // with rank 1's left element. The fold's pass 1 finds no (xy, z)
    // — "xy" doesn't exist yet — and pass 2 creates it too late. A
    // naive priority encode (no barrier) would wrongly apply rank 1
    // after rank 2.
    val merges = Seq(("xy", "z"), ("x", "y"))
    val (kernel, fold) = both(Seq("xyz"), merges)
    assert(kernel == fold, s"$kernel != $fold")
    assert(kernel == Seq("xy z </w>"),
      s"barrier must block the stale rank-1 merge: $kernel")
  }

  test("relearned pair: both ranks are honored in trajectory order") {
    // (ab, cd) appears at ranks 2 AND 4; at encode time the rank-2
    // slot is unusable ("ab" forms only at rank 3 > 2) but the
    // rank-4 slot must still fire. Keying the pair to its FIRST rank
    // only would leave "ab cd" unmerged.
    val merges = Seq(("c", "d"), ("ab", "cd"), ("a", "b"), ("ab", "cd"))
    val (kernel, fold) = both(Seq("abcd"), merges)
    assert(kernel == fold, s"$kernel != $fold")
    assert(kernel == Seq("abcd </w>"), s"rank-4 slot must fire: $kernel")
  }

  test("tripwire: encode plan size is constant in the merge count") {
    def planLen(n: Int): Int = {
      val table = (1 to n).map(i => (s"x$i", s"y$i")).toArray
      val bc = spark.sparkContext.broadcast(table)
      Seq("hello").toDF("word")
        .select(Bpe.encode(col("word"), bc).as("e"))
        .queryExecution.executedPlan.toString.length
    }
    val small = planLen(4)
    val big = planLen(10000)
    assert(math.abs(big - small) < 64,
      s"encode plan grew with the merge table: $small -> $big chars")
    // and the kernel stays inside whole-stage codegen (a local Seq
    // collapses to LocalTableScan, so project over a Range instead)
    val bc = spark.sparkContext.broadcast(Array(("l", "o")))
    val df = spark.range(2)
      .select(Bpe.encode(concat(lit("lo"), col("id").cast("string")), bc)
        .as("e"))
    // the "*(n)" prefix marks a WholeStageCodegen span in toString
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project"),
      df.queryExecution.executedPlan.toString)
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("lo 0 </w>", "lo 1 </w>"))
  }
}
