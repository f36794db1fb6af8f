package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iterative graph analytics beyond connected components (which
  * lives with its dedup consumer in [[Dedup.components]]).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic throughout:
  * ranks are scaled by 10¹² and every per-iteration operation is an
  * integer multiply/divide (`div`), so the result is bit-identical
  * regardless of aggregation order, partitioning, or engine — the
  * DuckDB oracle unrolls the same iterations as chained CTEs and
  * hash-matches exactly. A floating-point PageRank could only ever
  * be compared within a tolerance; the fixed-point formulation makes
  * an iterative numeric algorithm *oracle-checkable*, the same trick
  * the exact-cents money sums use.
  */
object Graph {

  private[graft] val Scale = 1000000000000L // 10^12 rank fixed-point
  private[graft] val Damping = 85 // ×10⁻² — classic 0.85

  /** Customer↔supplier trading edges: one edge per distinct
    * (customer, supplier) pair observed in orders⋈lineitem, in both
    * directions so the bipartite graph is walkable. One fact-fact
    * shuffle + a distinct; at 100 TB this is the standard edge
    * extraction (project early, distinct on the pair key). */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val pairs = t.lineitem.select(col("l_orderkey"), col("l_suppkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("C"), col("o_custkey")).as("c"),
        concat(lit("S"), col("l_suppkey")).as("s"))
      .distinct()
    pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
  }

  /** Fixed-iteration PageRank over the trading graph. Each round is
    * one shuffle (contributions grouped by destination, map-side
    * partial sums) plus a broadcast-sized join back to the degree
    * table; lineage is truncated per round with localCheckpoint, the
    * same loop discipline as [[Dedup.components]], so the plan stays
    * bounded at any iteration count. Every node has out-edges (both
    * edge directions exist), so there is no dangling-mass term; no
    * node misses in-contributions for the same reason, so the
    * per-round join is inner. */
  def pagerank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val edges = tradeEdges(spark, dir).cache()
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("outdeg"))
    val n = deg.count()
    val base = (Scale * 15 / 100) / n
    var pr = deg.withColumn("pr", lit(Scale / n)).localCheckpoint()
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(pr, col("src") === col("node"))
        .select(col("dst"), expr("pr div outdeg").as("contrib"))
      pr = contribs.groupBy(col("dst"))
        .agg(sum("contrib").as("in_sum"))
        .join(pr.select(col("node"), col("outdeg")), col("dst") === col("node"))
        .select(col("node"), col("outdeg"),
          (lit(base) + expr(s"($Damping * in_sum) div 100")).as("pr"))
        .localCheckpoint()
    }
    edges.unpersist(blocking = false)
    pr.select(col("node"), col("pr"))
      .orderBy(col("pr").desc, col("node"))
      .limit(100)
  }
}
