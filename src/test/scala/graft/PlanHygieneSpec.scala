package graft

/** Global plan-hygiene invariant over the ENTIRE query surface:
  * no query may plan a CartesianProduct. Unkeyed joins are the one
  * shape that cannot survive a 100 TB input — every intentional
  * cross join in the library carries a broadcast() one-row/tiny side
  * (scalar-subquery thresholds, query sets, sketch matrices), which
  * plans as BroadcastNestedLoopJoin, never CartesianProduct.
  *
  * Planning only (queryExecution.sparkPlan) — no execution — so this
  * also smoke-tests that every queries entry analyzes and plans
  * against a real SF directory. Iterative operators (components,
  * pagerank) do run their loop actions during construction; their
  * per-round plans are covered by their own specs, and the cheap
  * sf0.001 input keeps this suite fast.
  */
class PlanHygieneSpec extends SparkSpecBase {

  test("no query plans a CartesianProduct") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, Sf).queryExecution.sparkPlan.toString
        spark.catalog.clearCache()
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian joins in: ${offenders.mkString(", ")}")
  }
}
