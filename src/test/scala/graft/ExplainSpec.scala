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
    // customer carries NO hint (scales with the corpus); the size
    // gate must still pick broadcast-hash at test SF.
    val p = plan(Relational.q3JoinTopk(spark, Sf))
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
  }

  test("de-hinted part/customer/supplier joins still plan broadcast-hash at test SF") {
    // q2/q9/q16/q17/q19/q20 dropped their broadcast() hints on
    // filtered slices of `part` (r4), and r6 dropped the nine
    // supplier/supplier-derived hints (q2's eu, q5, q7, q8, q9, q11's
    // n3supp, q15, q16's badSupp, q21) — all corpus-scaling, where a
    // forced broadcast OOMs at 100 TB. AQE's size gate must keep the
    // small-SF plan broadcast-shaped, so correctness AND local perf
    // are unchanged; at scale the same plan degrades to a shuffle
    // join instead of dying. PlanHygieneSpec bans re-introducing the
    // hints (scalingLeafCols covers c_custkey/p_partkey/s_suppkey).
    val checks = Seq(
      "q2" -> Relational.q2MinCost(spark, Sf),
      "q7" -> Relational.q7NationVolume(spark, Sf),
      "q9" -> Relational.q9Profit(spark, Sf),
      "q11" -> Relational.q11ImportantParts(spark, Sf),
      "q15" -> Relational.q15TopSupplier(spark, Sf),
      "q16" -> Relational.q16SupplierCnt(spark, Sf),
      "q17" -> Relational.q17AvgQty(spark, Sf),
      "q19" -> Relational.q19OrPred(spark, Sf),
      "q20" -> Relational.q20ExcessSuppliers(spark, Sf),
      "q21" -> Relational.q21Waiting(spark, Sf),
      // r6: the decontam benchmark gram side is corpus-derived in this
      // stand-in (scales with the corpus) — de-hinted for the same
      // reason; AQE must still pick the broadcast semi-join here
      "decontam" -> graft.operators.Curation.pipelineDecontam(spark, Sf))
    for ((name, df) <- checks) {
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"),
        s"$name: expected AQE to size-gate into broadcast-hash:\n$p")
    }
  }

  test("corpus-scaling outputs carry no global presentation sort (no range exchange)") {
    // The gate re-sorts rows before hashing, so a trailing global
    // orderBy on an output that scales with the corpus buys nothing
    // and costs a full range exchange at 100× — those operators end in
    // sortWithinPartitions instead (the q_bloom_join pattern). This
    // pins the whole audited class: no rangepartitioning exchange
    // anywhere in the plan. Global sorts survive ONLY where bounded
    // output or a limit (TakeOrderedAndProject) makes them free.
    // Construction-only plans suffice for a negative assertion: AQE
    // can remove or downgrade exchanges at runtime, never introduce a
    // range exchange the initial plan lacks.
    val converted = Seq(
      "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
      "dedup_simhash", "dedup_incremental", "dedup_containment",
      "dedup_substring", "dedup_embedding", "dedup_semantic",
      "graph_triangles", "graph_kcore", "graph_kcore_weighted",
      "graph_communities_sweep", "graph_sssp", "graph_coreness",
      "graph_clustering", "basket_rules", "dedup_keep_best",
      "snapshot_scd2", "graph_backbone", "graph_ktruss", "snapshot_apply",
      "text_quality", "text_tokens", "text_readability",
      "text_fingerprint", "text_lm_score", "text_langid", "text_entropy",
      "text_tfidf", "pipeline_clean", "pipeline_pack", "text_repetition",
      "text_gopher", "pipeline_decontam", "pipeline_pii",
      "sample_stratified", "sample_weighted", "pipeline_mix",
      "pipeline_shuffle", "sample_importance",
      "mm_frame_sample", "mm_resize", "mm_features", "mm_dedup",
      "mm_dhash", "mm_dedup_real",
      "snapshot_diff", "snapshot_asof", "avro_roundtrip",
      "q_event_window", "q_sessionize", "q_range_join", "q_funnel",
      "q_gap_fill", "q_anomaly_days", "events_attribution", "events_rfm",
      "q_asof_join", "q_nearest_join", "text_normalize",
      "q_group_having", "q_window_rank", "q_window_running",
      "q_window_range", "q_window_lead", "q_ntile", "q_first_last",
      "q_semi_join", "q_anti_join", "q_set_ops", "q_string_funcs",
      "q_in_sub", "ann_range")
    for (name <- converted) {
      val df = SparkEntry.queries(name)(spark, Sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("rangepartitioning"),
        s"$name: corpus-scaling output must not end in a global sort:\n$p")
    }
  }

  test("importance sampler broadcasts the ratio table; dhash plan has zero exchanges") {
    // the 256-row likelihood-ratio table must ride a broadcast onto
    // the token stream — a shuffled join here would exchange the
    // whole exploded corpus on a 256-value key at 100 TB
    val p = plan(graft.operators.Curation.sampleImportance(spark, Sf))
    assert(p.contains("BroadcastHashJoin"),
      s"sample_importance: ratio join must broadcast:\n$p")
    // the real-decode fingerprint chain is map-side end to end:
    // render → decode → thumbnail → dhash → within-partition sort,
    // with NO exchange anywhere (per-image state is one long)
    val dh = SparkEntry.queries("mm_dhash")(spark, Sf)
    dh.collect()
    val dp = dh.queryExecution.executedPlan.toString
    assert(!dp.contains("Exchange"),
      s"mm_dhash: expected a shuffle-free map-side plan:\n$dp")
  }

  test("backbone ranks per-node via the bounded heap, never a Window") {
    // a window over the symmetric edge set would sort the
    // corpus-scaled edges per node at 100 TB; the mutual-top-m keep
    // list must come from the TopKScoreAgg bounded heap
    val df = SparkEntry.queries("graph_backbone")(spark, Sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      s"graph_backbone: per-node ranking must use the bounded heap:\n$p")
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

  test("q8 broadcasts all seven dimension joins around one fact shuffle") {
    // customer and the part subset carry NO hint (they scale with the
    // corpus — a forced broadcast OOMs at 100 TB); at test SF the size
    // gate must still pick broadcast-hash for all seven, so the small-SF
    // plan is unchanged from the hinted version.
    val p = plan(Relational.q8MarketShare(spark, Sf))
    val bhj = "BroadcastHashJoin".r.findAllIn(p).size
    assert(bhj >= 6, s"expected ≥6 broadcast joins, got $bhj:\n$p")
  }

  test("q2 aggregates only candidate-part lines (part join feeds the agg)") {
    // the (part, supplier) aggregate must CONSUME the broadcast join
    // with the filtered part side — i.e. the full-lineitem aggregate
    // formulation is gone. In tree-printed order the consumed join
    // appears below (after) the partial agg.
    val pre = Relational.q2MinCost(spark, Sf).queryExecution.sparkPlan.toString
    val aggIdx = pre.indexOf("partial_min")
    val partJoinIdx = pre.indexOf("BroadcastHashJoin [l_partkey")
    assert(aggIdx >= 0 && partJoinIdx > aggIdx,
      s"expected the part join below the partial agg:\n$pre")
  }

  test("pagerank rounds (shared by both variants) join the rank vector without re-exchanging edges") {
    import org.apache.spark.sql.functions._
    val g = graft.operators.Graph
    // the loop's edge layout: (src, dst, w) partitioned by src with
    // the outgoing-weight total attached on that same exchange —
    // uniform pagerank is w = 1 through the identical round
    val edges = spark.read.parquet(s"$Sf/lineitem.parquet")
      .select(concat(lit("S"), col("l_suppkey")).as("src"),
        concat(lit("C"), col("l_orderkey")).as("dst"), lit(2L).as("w"))
      .repartition(col("src"))
      .withColumn("wout", org.apache.spark.sql.functions.sum(
        col("w")).over(org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
    val pr = edges.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L)).localCheckpoint()
    val p = plan(g.round(edges, pr, 1000L, pr.select(col("node"))))
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"rank-vector join must not sort-merge (edge re-sort per round):\n$p")
  }

  test("pii scrub never shuffles: no hash exchange in the plan") {
    val p = plan(graft.operators.Curation.pipelinePii(spark, Sf))
    // the only exchange allowed is the presentation sort's range
    // partitioning — the scrub itself is a pure projection
    assert(!p.contains("Exchange hashpartitioning"),
      s"pii scrub must not shuffle:\n$p")
  }

  test("bm25 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(graft.operators.TextOps.textBm25(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("weighted sampling is a single scan with no exchange before the filter") {
    val df = graft.operators.Curation.sampleWeighted(spark, Sf)
    val pre = df.queryExecution.sparkPlan.toString
    // the keep decision is row-local: filter sits directly on the scan
    val filterIdx = pre.indexOf("Filter")
    val scanIdx = pre.indexOf("FileScan")
    assert(filterIdx >= 0 && scanIdx > filterIdx,
      s"expected filter directly over the scan:\n$pre")
    assert(!pre.substring(filterIdx, scanIdx).contains("Exchange"),
      s"no exchange may sit between scan and filter:\n$pre")
  }

  test("shuffle assignment is map-only: no exchange anywhere in the plan") {
    val df = graft.operators.Curation.pipelineShuffle(spark, Sf)
    val pre = df.queryExecution.sparkPlan.toString
    assert(!pre.contains("Exchange"),
      s"the epoch-shuffle assignment must stay a pure projection:\n$pre")
  }

  test("profiler is one scan: a single parquet read feeds the melt") {
    val p = plan(graft.operators.Profile.numericProfile(spark, Sf))
    val scans = "FileScan parquet".r.findAllIn(p).size
    // ÷2: executedPlan + formatted both counted
    assert(scans <= 2, s"expected one lineitem scan per plan text:\n$p")
  }

  test("entropy kernel keeps the operator map-only (no hash exchange)") {
    val p = plan(graft.operators.TextOps.textEntropy(spark, Sf))
    // only the presentation sort's range partitioning may exchange
    assert(!p.contains("Exchange hashpartitioning"),
      s"entropy must not shuffle:\n$p")
    assert(p.contains("char_moments"), s"fused kernel missing:\n$p")
  }

  test("readability is map-only ahead of the presentation sort") {
    val p = plan(graft.operators.TextOps.textReadability(spark, Sf))
    assert(!p.contains("Exchange hashpartitioning"),
      s"readability must not shuffle:\n$p")
  }

  test("markov shares one user exchange between window and count aggregate") {
    val p = plan(graft.operators.Events.qMarkov(spark, Sf))
    val n = "Exchange hashpartitioning".r.findAllIn(p).size
    // window on user_id, pair-count agg, from_type total window —
    // three exchange points, each in executedPlan + formatted (÷2)
    assert(n <= 6, s"too many hash exchanges ($n):\n$p")
  }

  test("skyline local phase is narrow: no exchange before the local sweep") {
    val df = graft.operators.Skyline.qSkyline(spark, Sf)
    val pre = df.queryExecution.sparkPlan.toString
    // the per-partition sort must be SortExec without a shuffle under
    // it feeding the sweep (coalesce(1) is narrow too)
    assert(pre.contains("Coalesce 1"), s"expected narrow coalesce:\n$pre")
  }

  test("paths top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(graft.operators.Events.qPaths(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("collocations top-k compiles to TakeOrderedAndProject") {
    val p = plan(graft.operators.TextOps.textCollocations(spark, Sf))
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }
}
