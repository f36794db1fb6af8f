package graft

import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates vs their exact counterparts
  * (the q_distinct_agg / q_percentiles companions promised in
  * SURVEY.md §2 B). */
class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = graft.core.Tables(spark, Sf).lineitem
    val r = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("kmv overlap: exact regime — a union smaller than k IS the population") {
    import spark.implicits._
    // A = clickers 1..30, B = viewers 21..50: union 50 < k=256, so the
    // sketch holds every member and all five figures are exact
    val ev = ((1 to 30).map(u => (u.toLong, "click")) ++
      (21 to 50).map(u => (u.toLong, "view")))
      .toDF("user_id", "event_type")
    val r = graft.operators.Profile.kmvOverlapDf(ev).head()
    assert(r.getLong(0) == 50L, "k_used = |A ∪ B|")
    assert(r.getLong(1) == 10L, "matches = |A ∩ B|")
    assert(r.getLong(2) == 200000L, "jaccard = 10/50 exactly, in ppm")
    assert(r.getDouble(3) == 50.0, "union estimate is exact below k")
    assert(r.getDouble(4) == 10.0, "intersection estimate is exact below k")
  }

  test("kmv overlap: estimator regime is partition-invariant and in-band") {
    import spark.implicits._
    // union 300 > k=256: the (k−1)·2⁶⁰/h₍ₖ₎ estimator engages; truth
    // is |A∪B| = 300, J = 100/300
    val ev = ((1 to 200).map(u => (u.toLong, "click")) ++
      (101 to 300).map(u => (u.toLong, "view")))
      .toDF("user_id", "event_type")
    val r = graft.operators.Profile.kmvOverlapDf(ev).head()
    assert(r.getLong(0) == 256L)
    val unionEst = r.getDouble(3)
    assert(math.abs(unionEst - 300.0) / 300.0 < 0.2,
      s"KMV union estimate $unionEst vs truth 300 (±1/√k band)")
    val jac = r.getLong(2).toDouble / 1e6
    assert(math.abs(jac - 100.0 / 300.0) < 0.1,
      s"sketch Jaccard $jac vs truth 0.333")
    // pure multiset function: any partitioning folds to the same row
    val r7 = graft.operators.Profile.kmvOverlapDf(ev.repartition(7)).head()
    assert(r == r7, "sketch must not depend on partitioning")
  }

  test("percentile_approx brackets the exact percentile") {
    val o = graft.core.Tables(spark, Sf).orders
    val r = o.agg(
      percentile(col("o_totalprice"), lit(0.5)).as("exact"),
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx"))
      .head()
    val exact = r.getDouble(0)
    val approx = r.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.01,
      s"approx $approx vs exact $exact")
  }
}
