package graft

import graft.operators.Relational

/** Plan-shape assertions: the scale properties SURVEY.md §5 claims
  * (pushdown, pruning, broadcast, whole-stage codegen) must be visible
  * in the physical plan, not just intended. */
class ExplainSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // materialize so AQE settles on the final plan
    val qe = df.queryExecution
    qe.executedPlan.toString + "\n" + qe.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q6 pushes filters into the parquet scan and prunes columns") {
    val p = plan(Relational.q6FilterAgg(spark, Sf))
    assert(p.contains("PushedFilters: ["), s"no pushdown in:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"),
      "shipdate filter should reach the scan")
    // projection needs only 4 columns; the scan must not read all 11
    assert(!p.contains("l_orderkey"), s"column pruning failed:\n$p")
  }

  test("q3 broadcasts the filtered dimension side") {
    val p = plan(Relational.q3JoinTopk(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("q1 keeps partial (map-side) aggregation before the shuffle") {
    val df = Relational.q1Agg(spark, Sf)
    // pre-AQE physical plan shows the partial/final aggregate split
    assert(df.queryExecution.sparkPlan.toString.contains("partial_"),
      "no map-side combine")
    df.collect()
    // post-execution plan shows whole-stage-codegen spans as *(n)
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "aggregation should be codegen'd")
  }

  test("topk compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.qTopkOrders(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("sessionize shares one hash exchange across both windows and the aggregate") {
    val p = plan(graft.operators.Events.qSessionize(spark, Sf))
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    // lag-window, running-sum-window, and the (user_id, session_id)
    // groupBy all cluster on user_id → a single exchange feeds all
    // three (÷2: executedPlan string + formatted string both counted)
    assert(hashExchanges <= 2, s"expected 1 hash exchange per plan text:\n$p")
  }

  test("q5 broadcasts every dimension side") {
    val p = plan(Relational.q5Multijoin(spark, Sf))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 3, s"expected ≥3 broadcast joins, got $bhj:\n$p")
  }
}
