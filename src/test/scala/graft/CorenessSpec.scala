package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Graph

/** k-core decomposition via the h-index fixed point
  * ([[Graph.corenessOf]]).
  *
  * The load-bearing contracts, each pinned exactly:
  *  - closed-form coreness on planted graphs (clique+pendant, two
  *    cliques bridged by a path — the bridge must not inflate
  *    either side's core);
  *  - DEFINITIONAL consistency with the peel: for every k, the nodes
  *    with coreness ≥ k are exactly the k-core's members ([[
  *    Graph.kcoreOf]] run to stability on the same graph) — the two
  *    operators must tell one story;
  *  - rounds past convergence are idempotent (a generous budget
  *    changes nothing), and a capped budget is a monotone
  *    over-estimate (values only ever decrease).
  *
  * The corpus-wide twin is the `graph_coreness` oracle gate (the
  * same collapsed-profile h-index rounds unrolled as window CTEs,
  * all three SFs). */
class CorenessSpec extends SparkSpecBase {

  import spark.implicits._

  /** Symmetric edge frame from undirected pairs. */
  private def und(pairs: (Long, Long)*): DataFrame =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  private def cmap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("closed forms: clique+pendant; bridged cliques keep their cores") {
    // triangle {1,2,3} with pendant 4 hung off node 1
    val tri = und(1L -> 2L, 2L -> 3L, 1L -> 3L, 1L -> 4L)
    assert(cmap(Graph.corenessOf(tri)) ==
      Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    // two 4-cliques joined by a 2-edge path: clique nodes stay
    // coreness 3, the path nodes are 1 — the bridge lifts nothing
    val k4a = Seq(1L, 2L, 3L, 4L).combinations(2).map(s => (s(0), s(1))).toSeq
    val k4b = Seq(11L, 12L, 13L, 14L).combinations(2).map(s => (s(0), s(1))).toSeq
    val g = und((k4a ++ k4b ++ Seq(4L -> 20L, 20L -> 11L)): _*)
    val c = cmap(Graph.corenessOf(g))
    assert((k4a ++ k4b).flatMap(p => Seq(p._1, p._2)).distinct
      .forall(n => c(n) == 3L), s"clique nodes must be coreness 3: $c")
    // the bridge node lies on no cycle, but coreness is about the
    // PEEL, not cycles: with degree exactly 2 it never drops below
    // the k=2 cut, so it sits in the global 2-core
    assert(c(20L) == 2L, "a degree-2 bridge survives the 2-peel")
  }

  test("coreness >= k is exactly the k-core, for every k") {
    // an irregular planted graph: triangle + K4 sharing a node +
    // pendant chain
    val k4 = Seq(5L, 6L, 7L, 8L).combinations(2).map(s => (s(0), s(1))).toSeq
    val g = und((k4 ++ Seq(1L -> 2L, 2L -> 3L, 1L -> 3L, 3L -> 5L,
      8L -> 9L, 9L -> 10L)): _*)
    val c = cmap(Graph.corenessOf(g))
    val canonical = g.select($"src".as("a"), $"dst".as("b"))
      .filter($"a" < $"b")
    for (k <- 1 to 4) {
      val core = Graph.kcoreOf(canonical, k, maxRounds = 10)
        .collect().map(_.getLong(0)).toSet
      val byCoreness = c.filter(_._2 >= k).keySet
      assert(core == byCoreness,
        s"k=$k: peel gives $core, coreness gives $byCoreness")
    }
  }

  test("generous budgets are idempotent; a capped budget over-estimates") {
    // a 6-chain needs several rounds to drain to all-1s
    val chain = und(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L, 5L -> 6L)
    val full = cmap(Graph.corenessOf(chain, maxRounds = 12))
    assert(full.values.forall(_ == 1L))
    assert(cmap(Graph.corenessOf(chain, maxRounds = 20)) == full)
    val capped = cmap(Graph.corenessOf(chain, maxRounds = 1))
    assert(full.forall { case (n, v) => capped(n) >= v },
      "pre-convergence values must upper-bound the fixed point")
  }

  test("empty edge set yields an empty decomposition") {
    assert(Graph.corenessOf(und()).count() == 0)
  }
}
