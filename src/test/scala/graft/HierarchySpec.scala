package graft

import org.apache.spark.sql.functions._

import graft.operators.Hierarchy

/** Pointer-doubling hierarchy closure: depth/root correctness on
  * crafted trees (deep chain, forest, bushy), and the fail-fast
  * contract on cycles and dangling parents. The gated q_hierarchy
  * surface is hash-proven against the naive recursive walk; these
  * specs cover the shapes the derived customer tree can't show. */
class HierarchySpec extends SparkSpecBase {
  import spark.implicits._

  private def flat(rel: Seq[(Long, Long)], isRoot: Long => Boolean,
      maxRounds: Int = 40) =
    Hierarchy.flattenOf(rel.toDF("node", "parent"),
      isRoot = udfFreeRoot(rel, isRoot), maxRounds)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  // express the root predicate as a plain Column over the node ids
  // (isin over the root set — spec-sized; the operator contract only
  // needs a Column)
  private def udfFreeRoot(rel: Seq[(Long, Long)], isRoot: Long => Boolean) = {
    val roots = rel.map(_._1).filter(isRoot)
    if (roots.isEmpty) lit(false) else col("node").isin(roots: _*)
  }

  test("deep chain: depth 99 closes in log-many rounds") {
    // 1 <- 2 <- 3 <- ... <- 100 (parent = k-1), root = 1
    val rel = (1L to 100L).map(k => (k, k - 1))
    val out = flat(rel, _ == 1L, maxRounds = 10) // ceil(log2(99)) = 7 < 10
    assert(out(1L) == ((1L, 0L)))
    assert(out(100L) == ((1L, 99L)))
    assert(out(50L) == ((1L, 49L)))
    assert(out.size == 100)
    assert(out.forall(_._2._1 == 1L), "single root everywhere")
  }

  test("forest: every node lands on ITS root with the exact depth") {
    // two trees: {1 <- 10 <- 100} and {2 <- 20, 2 <- 21 <- 210}
    val rel = Seq((1L, 0L), (10L, 1L), (100L, 10L),
      (2L, 0L), (20L, 2L), (21L, 2L), (210L, 21L))
    val out = flat(rel, k => k == 1L || k == 2L)
    assert(out(1L) == ((1L, 0L)) && out(2L) == ((2L, 0L)))
    assert(out(100L) == ((1L, 2L)))
    assert(out(20L) == ((2L, 1L)) && out(210L) == ((2L, 2L)))
  }

  test("cycle fails fast instead of looping") {
    val rel = Seq((1L, 2L), (2L, 1L), (3L, 1L))
    val e = intercept[IllegalStateException] {
      flat(rel, _ => false, maxRounds = 5)
    }
    assert(e.getMessage.contains("cycle"))
  }

  test("dangling parent pointer fails fast") {
    val rel = Seq((1L, 0L), (5L, 42L)) // 42 is not a node
    val e = intercept[IllegalStateException] {
      flat(rel, _ == 1L, maxRounds = 5)
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("rollup: members partition across roots, totals conserve") {
    val t = graft.core.Tables(spark, Sf)
    val rows = Hierarchy.hierarchyRollup(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSet.subsetOf((0L to 7L).toSet))
    val (nTotal, centsTotal) = (t.customer.count(),
      t.customer.agg(sum(round(col("c_acctbal") * 100, 0).cast("long")))
        .head().getLong(0))
    assert(rows.map(_._2).sum == nTotal, "every customer in exactly one tree")
    assert(rows.map(_._4).sum == centsTotal, "exact cents conserve")
    // root 0's tree is {0} alone — every div-8 chain from k >= 8 lands
    // in 1..7 before reaching 0; the other roots carry real subtrees
    val byRoot = rows.map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byRoot(0L) == ((1L, 0L)))
    (1L to 7L).foreach(r => assert(byRoot(r)._2 >= 1L, s"root $r"))
  }

  test("gated surface matches the arithmetic closed form at sf0.001") {
    val out = Hierarchy.hierarchy(spark, Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (node, root, depth) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // closed form: repeatedly div 8 until < 8
      var (cur, d) = (node, 0L)
      while (cur >= 8) { cur /= 8; d += 1 }
      assert(root == cur && depth == d, s"node $node -> ($root, $depth)")
    }
  }
}
