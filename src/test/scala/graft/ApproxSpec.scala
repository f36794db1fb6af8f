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
