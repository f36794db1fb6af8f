package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.apache.spark.sql.DataFrame

import graft.operators._

/** Concurrent-session correctness: one SparkSession serving parallel
  * queries is the production shape (a notebook cluster, a query
  * service), and it is exactly where the shared-state paths can race
  * — PlanCache's first-build race (two consumers of the dedup pair
  * base arriving together), Tables' resolved-relation LRU, the
  * fixed-point loops' checkpoint bookkeeping. Each query's result
  * must be identical to its sequential run. */
class ConcurrencySpec extends SparkSpecBase {

  // the interesting set: PlanCache-sharing families (dedup pair base,
  // profiler sample, graph trade pairs) plus an iterative loop and a
  // plain aggregate as controls
  private lazy val queries: Seq[(String, () => DataFrame)] = Seq(
    "dedup_ngram_jaccard" -> (() => Dedup.ngramJaccard(spark, Sf)),
    "dedup_containment" -> (() => Dedup.containment(spark, Sf)),
    "dedup_components" -> (() => Dedup.ngramComponents(spark, Sf)),
    "profile_quantiles" -> (() => Profile.quantileProfile(spark, Sf)),
    "profile_mad" -> (() => Profile.madProfile(spark, Sf)),
    "graph_pagerank" -> (() => Graph.pagerank(spark, Sf)),
    "graph_kcore" -> (() => Graph.kcore(spark, Sf)),
    "q1_agg" -> (() => Relational.q1Agg(spark, Sf)),
    // r8: the sweep shares the co-supply base with communities AND
    // runs a driver-side probe + one fused propagation loop — the
    // newest PlanCache consumer, racing the single-threshold view
    "graph_communities" -> (() => Graph.supplierCommunities(spark, Sf)),
    "graph_communities_sweep" -> (() => Graph.supplierCommunitySweep(spark, Sf)),
  )

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("parallel execution matches sequential results exactly") {
    // sequential baseline first (also warms nothing persistent:
    // clearCache drops storage, PlanCache re-materializes per use)
    val sequential = queries.map { case (n, f) => n -> rows(f()) }.toMap
    spark.catalog.clearCache()
    // all queries at once on a dedicated pool — wide enough that the
    // shared-frame consumers genuinely overlap
    val pool = Executors.newFixedThreadPool(queries.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val fs = queries.map { case (n, f) => Future(n -> rows(f())) }
      val concurrent = Await.result(Future.sequence(fs), 10.minutes).toMap
      queries.foreach { case (n, _) =>
        assert(concurrent(n) == sequential(n),
          s"$n diverged under concurrent execution")
      }
    } finally pool.shutdown()
  }

  test("racing first-builds of one shared frame agree") {
    // hammer the PlanCache race directly: clear storage, then have
    // two threads build the SAME pair-base consumers simultaneously,
    // repeatedly — the documented loser-drop path must stay
    // value-invisible
    val pool = Executors.newFixedThreadPool(2)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      for (round <- 1 to 3) {
        // clearCache alone drops storage but NOT the PlanCache memo —
        // a hit would only re-cache, never re-enter the first-insert
        // race. Invalidate every memo so both consumers genuinely
        // race the build of the shared pair base each round.
        graft.core.PlanCache.invalidate("")
        spark.catalog.clearCache()
        val a = Future(rows(Dedup.ngramJaccard(spark, Sf)))
        val b = Future(rows(Dedup.containment(spark, Sf)))
        val (ra, rb) = (Await.result(a, 5.minutes), Await.result(b, 5.minutes))
        val (sa, sb) = (rows(Dedup.ngramJaccard(spark, Sf)),
          rows(Dedup.containment(spark, Sf)))
        assert(ra == sa && rb == sb, s"round $round diverged")
      }
    } finally pool.shutdown()
  }
}
