package graft

import scala.util.Random

/** Algorithmic reference check for the BPE merge loop: a sequential
  * in-memory implementation of greedy byte-pair encoding (the
  * textbook algorithm, written independently of the SQL
  * formulation) must produce the identical merge trajectory AND the
  * identical post-merge vocabulary on seeded random corpora drawn
  * from a tiny alphabet — small alphabets force dense pair
  * collisions, overlapping runs (`aaa`), adjacent sites (`abab`),
  * and constant cnt-ties, exactly the cases where the
  * double-space-replace trick or the (cnt, a, b) tie order could
  * silently diverge from real BPE. */
class BpeReferenceSpec extends SparkSpecBase {
  import spark.implicits._

  /** Textbook sequential BPE over (word, freq) types. */
  private def referenceBpe(vocab: Map[String, Long], rounds: Int)
      : (Seq[(String, String, Long)], Map[Seq[String], Long]) = {
    var v: Map[Seq[String], Long] = vocab.map { case (w, f) =>
      (w.toSeq.map(_.toString) :+ "</w>") -> f
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var done = false
    for (_ <- 1 to rounds if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      v.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b, cnt))
        v = v.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              out += a + b; i += 2 // greedy left-to-right
            } else { out += syms(i); i += 1 }
          }
          out.toSeq -> f
        }
      }
    }
    (merges.toSeq, v)
  }

  test("merge trajectory and vocabulary match the sequential reference on random corpora") {
    val rnd = new Random(20260815L)
    for (trial <- 1 to 4) {
      val words = Seq.fill(30)(
        (1 to (1 + rnd.nextInt(6))).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString)
      val docs = words.grouped(6).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toSeq.toDF("doc_id", "text")
      val vocab = words.groupBy(identity).map { case (w, g) =>
        w -> g.size.toLong }
      val (refMerges, refVocab) = referenceBpe(vocab, rounds = 6)
      val gotMerges = graft.operators.TextOps.bpeMergesDf(spark, docs, 6)
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      assert(gotMerges.toSeq == refMerges,
        s"trial $trial merges: ${gotMerges.toSeq} != $refMerges\nwords: $words")
      val refTable = refVocab.toSeq
        .flatMap { case (syms, f) => syms.map(_ -> f) }
        .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
      val gotTable = graft.operators.TextOps.bpeVocabDf(spark, docs, 6)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotTable == refTable,
        s"trial $trial vocab: $gotTable != $refTable\nwords: $words")
    }
  }

  test("minFreq cutoff ≡ full-table merges when the tail can't flip a winner") {
    // Head types: high-frequency words over {a,b,c} whose pair counts
    // dominate. Tail: singleton words over a DISJOINT alphabet
    // {x,y,z}, so dropping them removes pair mass no head merge ever
    // competes with — the trajectories must be bit-identical. This is
    // the plumbing proof (cutoff filters before the collect, nothing
    // else changes); on corpora where tail pairs do overlap head
    // pairs the cutoff is a declared approximation, like every
    // production trainer's.
    val head = Seq.fill(20)("abcab") ++ Seq.fill(15)("bca") ++
      Seq.fill(10)("cab") ++ Seq.fill(5)("abc")
    val tail = Seq("xyz", "zyx", "xzy", "yxz", "yzx") // freq 1 each
    val docs = (head ++ tail).grouped(7).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val full = graft.operators.TextOps
      .bpeMergesDf(spark, docs, rounds = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val cut = graft.operators.TextOps
      .bpeMergesDf(spark, docs, rounds = 8, minFreq = 2L).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    assert(cut.nonEmpty && cut.toSeq == full.toSeq,
      s"cutoff trajectory diverged: ${cut.toSeq} != ${full.toSeq}")
    // and the cutoff genuinely dropped the tail from the learn state:
    // a merge of two tail symbols can never appear
    assert(!cut.exists(m => "xyz".contains(m._2.take(1))))
  }
}
