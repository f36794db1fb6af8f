package graft

import org.apache.spark.sql.DataFrame

import graft.operators.Graph

/** Hop-bounded single-source shortest paths ([[Graph.ssspOf]]).
  *
  * The load-bearing contracts, each pinned exactly:
  *  - the encoded min is LEXICOGRAPHIC: fewest hops first, cheapest
  *    total weight among fewest-hop paths (a cheaper-but-longer path
  *    must lose; a same-hops-cheaper path must win);
  *  - after k rounds the result is exact over ≤ k-edge paths — a
  *    node whose shortest path has k+1 edges is absent until the
  *    round budget covers it, and rounds past the diameter are
  *    idempotent;
  *  - resume: running j rounds then k−j more from the output is
  *    identical to k straight rounds (min-plus relaxation is a pure
  *    function of (edges, state)), and a warm start over an
  *    edge-additive delta lands on the cold rerun's fixed point;
  *  - invalid weights fail fast (negative breaks the lexicographic
  *    encode; oversized breaks the 2⁴⁴ cost headroom).
  *
  * The corpus-wide twin is the `graph_sssp` oracle gate (unrolled
  * min-plus CTE chain over the co-supply graph, all three SFs). */
class SsspSpec extends SparkSpecBase {

  import spark.implicits._

  private def edges(rows: (Long, Long, Long)*): DataFrame =
    rows.toDF("src", "dst", "w")

  private def from(nodes: Long*): DataFrame =
    nodes.map(n => (n, 0L, 0L)).toDF("node", "hops", "cost")

  private def dists(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

  test("fewest hops beats a cheaper longer path; cost breaks same-hop ties") {
    // to node 4: 2 hops at cost 20 (via 2) vs 3 hops at cost 3 (via
    // 3 → 5) — the 2-hop path must win despite costing 6× more
    val diamond = edges((1L, 2L, 10L), (2L, 4L, 10L),
      (1L, 3L, 1L), (3L, 5L, 1L), (5L, 4L, 1L))
    assert(dists(Graph.ssspOf(diamond, from(1))) ==
      Seq((1L, 0L, 0L), (2L, 1L, 10L), (3L, 1L, 1L),
        (4L, 2L, 20L), (5L, 2L, 2L)))
    // both 2-hop routes to 4: cost 6 (via 2) vs cost 3 (via 3) —
    // same hops, so the cheaper total wins
    val tie = edges((1L, 2L, 5L), (1L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 2L))
    assert(dists(Graph.ssspOf(tie, from(1))).find(_._1 == 4L)
      .contains((4L, 2L, 3L)))
  }

  test("round budget bounds path length; extra rounds are idempotent") {
    // a 5-edge chain: node 6 is exactly 5 hops out
    val chain = edges((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L))
    val r4 = dists(Graph.ssspOf(chain, from(1), rounds = 4))
    assert(!r4.exists(_._1 == 6L), "5-hop node must be absent at 4 rounds")
    val r5 = dists(Graph.ssspOf(chain, from(1), rounds = 5))
    assert(r5.find(_._1 == 6L).contains((6L, 5L, 5L)))
    assert(dists(Graph.ssspOf(chain, from(1), rounds = 8)) == r5,
      "rounds past the diameter must be idempotent")
  }

  test("resume: j + (k−j) rounds from the output equals k straight rounds") {
    val g = edges((1L, 2L, 3L), (2L, 3L, 4L), (3L, 4L, 5L),
      (1L, 4L, 100L), (4L, 5L, 1L))
    val cold = dists(Graph.ssspOf(g, from(1), rounds = 4))
    val mid = Graph.ssspOf(g, from(1), rounds = 2)
    assert(dists(Graph.ssspOf(g, mid, rounds = 2)) == cold,
      "the distance trajectory must be resumable exactly")
  }

  test("warm start over an edge-additive delta lands on the cold fixed point") {
    val day1 = Seq((1L, 2L, 2L), (2L, 3L, 2L))
    val delta = Seq((3L, 4L, 1L), (1L, 4L, 9L))
    val full = edges((day1 ++ delta): _*)
    val cold = dists(Graph.ssspOf(full, from(1), rounds = 4))
    val seed = Graph.ssspOf(edges(day1: _*), from(1), rounds = 4)
    assert(dists(Graph.ssspOf(full, seed, rounds = 4)) == cold,
      "yesterday's distances are valid over-estimates — relaxation " +
        "must converge them to the grown graph's fixed point")
  }

  test("invalid weights fail fast; zero weight is legal") {
    val neg = edges((1L, 2L, -1L))
    assertThrows[IllegalArgumentException](Graph.ssspOf(neg, from(1)))
    val huge = edges((1L, 2L, Graph.HopSpan / 2))
    assertThrows[IllegalArgumentException](Graph.ssspOf(huge, from(1)))
    assert(dists(Graph.ssspOf(edges((1L, 2L, 0L)), from(1))) ==
      Seq((1L, 0L, 0L), (2L, 1L, 0L)))
  }

  test("empty graph and empty source set stay empty") {
    val none = edges()
    assert(Graph.ssspOf(none, from(1)).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 0L)), "isolated source keeps its zero distance")
    val g = edges((1L, 2L, 1L))
    assert(Graph.ssspOf(g, from()).count() == 0)
  }
}
