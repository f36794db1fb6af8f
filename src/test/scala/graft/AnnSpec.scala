package graft

import graft.operators.Ann

/** ANN variants vs the exact brute-force baseline. The synthetic
  * embeddings are near-uniform on the sphere (no cluster structure),
  * which is the worst case for space-partitioning indexes — recall
  * thresholds are set accordingly and the exact baseline is the
  * correctness anchor (oracle-checked in the driver). */
class AnnSpec extends SparkSpecBase {

  private def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.sortBy(_._2).map(_._3).toSeq }

  private lazy val exact = topk(Ann.bruteforce(spark, Sf))

  /** Mean recall@5 across queries. (keys.toSeq matters: mapping over
    * the key SET would dedup equal per-query recalls before summing —
    * 10 perfect queries would "sum" to 1.0 and report 0.1.) */
  private def recallOf(approx: Map[Long, Seq[Long]]): Double =
    exact.keys.toSeq.map { q =>
      val a = approx.getOrElse(q, Seq.empty).toSet
      exact(q).count(a.contains).toDouble / exact(q).size
    }.sum / exact.size

  test("bruteforce rank-1 is the query itself at cosine 1") {
    val self = Ann.bruteforce(spark, Sf).filter("rank = 1").collect()
    assert(self.length == 10)
    self.foreach { r =>
      assert(r.getLong(0) == r.getLong(2), "rank-1 must be the query vector")
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)
    }
  }

  test("int8-quantized search with exact rerank recovers the exact top-5") {
    val approx = topk(Ann.quantized(spark, Sf))
    val recall = recallOf(approx)
    info(s"quantized recall@5 = $recall")
    // 10x rerank margin makes int8 noise irrelevant at top-5
    assert(recall >= 0.95, s"quantized recall $recall")
    // codes really are int8 (4x density vs float32)
    val schema = graft.core.Tables(spark, Sf).embeddings
      .withColumn("scale", graft.functions.Vectors.quantScale(org.apache.spark.sql.functions.col("embedding")))
      .withColumn("codes", graft.functions.Vectors.quantize(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("scale")))
      .schema("codes").dataType
    assert(schema.simpleString == "array<tinyint>")
  }

  test("pq recall@5 vs bruteforce (4-byte codes, 10x rerank margin)") {
    val approx = topk(Ann.pq(spark, Sf))
    val recall = recallOf(approx)
    info(s"pq recall@5 = $recall")
    // 8×4-bit codes from a hash-seeded (unrefined) codebook over
    // near-uniform vectors — the hardest setting for PQ; measured
    // 0.58 here (vs lsh 0.82 / ivf 0.76 on the same corpus), with
    // the 10× exact-rerank margin carrying ranking quality. The
    // driver's oracle gate separately pins the EXACT pipeline (codes,
    // ADC order, rerank) — this spec guards the quality floor.
    assert(recall >= 0.3, s"pq recall $recall below floor")
    // every query must return a full, deduplicated top-5
    approx.foreach { case (q, ids) =>
      assert(ids.size == 5 && ids.distinct.size == 5, s"query $q: $ids")
    }
  }

  test("trained pq: rounds=1 is the untrained query; training moves the codebook and cuts quantization error") {
    import org.apache.spark.sql.functions.col
    // the rounds=1 path IS pq (shared pipeline) — the refactor guard
    val untrained = Ann.pq(spark, Sf).collect().map(_.toSeq).toSeq
    val r1 = Ann.pqTrained(spark, Sf, rounds = 1).collect().map(_.toSeq).toSeq
    assert(r1 == untrained, "pqTrained(rounds=1) must equal pq bit-for-bit")
    // two Lloyd updates: the codebook moved off the hash seeds, and
    // total per-subspace quantization error (the thing ADC ranks by)
    // strictly fell — the point of training
    val qcorp = graft.operators.Cluster.quantized(
      graft.core.Tables(spark, Sf).embeddings
        .select(col("vec_id"), col("embedding")))
    val vecs = qcorp.select(col("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    def inertia(cbs: Array[Array[Array[Long]]]): BigInt =
      vecs.map { v =>
        (0 until cbs.length).map { s =>
          val d = cbs(s)(0).length
          val sl = v.slice(s * d, (s + 1) * d)
          cbs(s).map(c => sl.zip(c).map { case (a, b) =>
            BigInt(a - b) * BigInt(a - b) }.sum).min
        }.sum
      }.sum
    val seed = Ann.pqCodebooks(qcorp, rounds = 1)
    val trained = Ann.pqCodebooks(qcorp, rounds = 3)
    assert(seed.flatten.flatten.toSeq != trained.flatten.flatten.toSeq,
      "training left the codebook on the hash seeds")
    val (si, ti) = (inertia(seed), inertia(trained))
    info(s"subspace inertia: seed $si -> trained $ti")
    assert(ti < si, s"training did not reduce quantization error ($si -> $ti)")
  }

  test("trained pq recall@5 vs bruteforce") {
    val approx = topk(Ann.pqTrained(spark, Sf))
    val recall = recallOf(approx)
    info(s"trained pq recall@5 = $recall")
    // 2 Lloyd updates lift measured recall 0.58 -> 0.68 on the
    // near-uniform corpus (subspace inertia falls ~25%); floor set
    // under the measurement but above the untrained spec's 0.3
    assert(recall >= 0.45, s"trained pq recall $recall below floor")
    approx.foreach { case (q, ids) =>
      assert(ids.size == 5 && ids.distinct.size == 5, s"query $q: $ids")
    }
  }

  test("ivf-pq recall@5 vs bruteforce") {
    val approx = topk(Ann.ivfPq(spark, Sf))
    val recall = recallOf(approx)
    info(s"ivf-pq recall@5 = $recall")
    // two approximations compound (nprobe=8 cell pruning × 4-bit
    // residual codes) — the floor sits under both parents' measured
    // values (ivf 0.76, pq 0.58) on the worst-case corpus
    assert(recall >= 0.3, s"ivf-pq recall $recall below floor")
    approx.foreach { case (q, ids) =>
      assert(ids.size == 5 && ids.distinct.size == 5, s"query $q: $ids")
    }
  }

  test("lsh recall@5 vs bruteforce") {
    val approx = topk(Ann.lsh(spark, Sf))
    val recall = recallOf(approx)
    info(s"lsh recall@5 = $recall")
    // Hamming-≤2 multiprobe: measured 0.82 on these (near-uniform,
    // worst-case) vectors — up from 0.48 with the Hamming-1 ring
    assert(recall >= 0.7, s"lsh recall $recall below floor")
  }

  test("bucketed knn join: no self-pairs, <= k neighbors, scores are true cosines") {
    val knn = Ann.knnJoin(spark, Sf, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(knn.nonEmpty)
    knn.foreach { case (q, _, v, _) => assert(q != v, s"self-pair $q") }
    knn.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3, s"vector $q has ${rs.length} neighbors")
      // ranks are 1..n and scores non-increasing
      assert(rs.sortBy(_._2).map(_._2).toSeq == (1 to rs.length))
      val scores = rs.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // spot-check: a reported neighbor's cosine matches a direct compute
    val (q, _, v, c) = knn.head
    val e = graft.core.Tables(spark, Sf).embeddings
      .filter(org.apache.spark.sql.functions.col("vec_id").isin(q, v))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val (a, b) = (e(q), e(v))
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val exact = dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
      math.sqrt(b.map(x => x.toDouble * x).sum))
    assert(math.abs(exact - c) < 1e-5, s"cosine $c vs recomputed $exact")
  }

  test("ann plans have no per-qid Window (bounded-heap top-k aggregate instead)") {
    for ((name, df) <- Seq(
        "bruteforce" -> Ann.bruteforce(spark, Sf),
        "lsh" -> Ann.lsh(spark, Sf),
        "ivf" -> Ann.ivf(spark, Sf),
        "quantized" -> Ann.quantized(spark, Sf),
        "pq" -> Ann.pq(spark, Sf),
        "pq_trained" -> Ann.pqTrained(spark, Sf),
        "ivf_pq" -> Ann.ivfPq(spark, Sf))) {
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("Window"),
        s"$name still funnels the scored corpus through a window:\n$p")
      assert(p.contains("topk_by_score"),
        s"$name should rank via the bounded top-k aggregate:\n$p")
      assert(p.contains("partial_topk_by_score"),
        s"$name top-k must combine map-side (partial aggregation):\n$p")
    }
  }

  test("pre-built IVF index returns identical results with partition pruning") {
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString
    Ann.buildIvfIndex(spark, Sf, indexPath)
    val indexed = Ann.ivfIndexed(spark, Sf, indexPath)
    val got = indexed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Ann.ivf(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, "indexed IVF must equal inline IVF")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters"),
      s"expected a partition-pruned index read:\n$plan")
  }

  test("IVF index appends: build(subset)+append ≡ full build; retries and half-writes are safe") {
    import org.apache.spark.sql.functions.col
    val full = java.nio.file.Files.createTempDirectory("graft_ivf_full").toString
    Ann.buildIvfIndex(spark, Sf, full)
    val grown = java.nio.file.Files.createTempDirectory("graft_ivf_grow").toString
    // base = all but every 7th vector; the rest arrives as two shards
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
    val cb = Ann.codebookOf(spark, Sf)
    Ann.buildIvfIndex(spark, Sf, grown)
    // carve the base down by rewriting it from the subset
    val hfs = new org.apache.hadoop.fs.Path(grown)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(grown), true)
    val base = emb.filter(col("vec_id") % 7 =!= 0)
    val lateA = emb.filter(col("vec_id") % 14 === 0)
    val lateB = emb.filter(col("vec_id") % 7 === 0 && col("vec_id") % 14 =!= 0)
    // a thin build path for arbitrary frames: append onto an empty base
    Ann.appendToIvfIndex(base, grown, cb, "s0")
    Ann.appendToIvfIndex(lateA, grown, cb, "s1")
    Ann.appendToIvfIndex(lateB, grown, cb, "s2")
    def rank(path: String) = Ann.ivfIndexed(spark, Sf, path).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(rank(grown) == rank(full),
      "grown index must probe identically to the one-shot build")
    // committed-shard retry is a no-op, not a double-insert
    Ann.appendToIvfIndex(lateA, grown, cb, "s1")
    assert(Ann.loadIvfIndex(spark, grown).count() == emb.count(),
      "retried append must not duplicate vectors")
    // a half-written shard (no marker) is invisible
    Ann.appendToIvfIndex(emb.filter(col("vec_id") === 1L), grown, cb, "shalf")
    hfs.delete(new org.apache.hadoop.fs.Path(s"$grown/_COMMITTED_shalf"),
      false)
    assert(Ann.loadIvfIndex(spark, grown).count() == emb.count(),
      "uncommitted shard must be invisible")
    // a rebuild replaces the whole layout (appended shards gone)
    Ann.buildIvfIndex(spark, Sf, grown)
    assert(Ann.loadIvfIndex(spark, grown).count() == emb.count())
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$grown/shard=s1")),
      "rebuild must remove appended shards")
    assert(rank(grown) == rank(full), "rebuilt index probes identically")
  }

  test("pre-built IVF-PQ index returns identical results with partition pruning") {
    val indexPath = java.nio.file.Files
      .createTempDirectory("graft_ivfpq").toString
    Ann.buildIvfPqIndex(spark, Sf, indexPath)
    val indexed = Ann.ivfPqIndexed(spark, Sf, indexPath)
    val got = indexed.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val want = Ann.ivfPq(spark, Sf).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want, "indexed IVF-PQ must equal inline IVF-PQ")
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning") || plan.contains("PartitionFilters"),
      s"expected a partition-pruned code read:\n$plan")
  }

  test("ivf recall@5 vs bruteforce") {
    val approx = topk(Ann.ivf(spark, Sf))
    val recall = recallOf(approx)
    info(s"ivf recall@5 = $recall")
    // nprobe=8 over the IvfK=64 hash-ordered codebook reads 8/64
    // cells = 12.5% of this CLUSTERLESS corpus and still measures
    // 0.54 (self-match + genuine near-neighbors concentrate in the
    // probed cells); the old corpus-proportional codebook read 44%
    // of the corpus for 0.76 — more recall only because it scanned
    // 3.5× more data, which is exactly the asymptote bug. Real
    // clustered embeddings fare far better at the same probe budget.
    assert(recall >= 0.45, s"ivf recall $recall below floor")
  }

  test("fused NearestCells kernel equals the composed struct-array form") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val cb = Ann.codebookOf(spark, Sf)
    val bc = spark.sparkContext.broadcast(cb)
    val both = graft.core.Tables(spark, Sf).embeddings
      .select(col("vec_id"),
        element_at(Vectors.nearestCells(col("embedding"), bc, 1), 1)
          .as("fused_cell"),
        Ann.cellOfComposed(col("embedding"), cb).as("composed_cell"),
        Vectors.nearestCells(col("embedding"), bc, 8).as("fused_probes"),
        Ann.nearestCellsComposed(col("embedding"), cb, 8).as("composed_probes"))
    val bad = both.filter(col("fused_cell") =!= col("composed_cell") ||
      col("fused_probes") =!= col("composed_probes"))
    assert(bad.isEmpty, s"kernels diverge: ${bad.take(3).mkString(";")}")
  }

  test("codebook is bounded by IvfK at EVERY scale factor (never ∝ corpus)") {
    // the 100×-scale contract: the coarse codebook is a declared
    // constant number of cells — the driver collect, the broadcast,
    // and the per-row argmax cost are all corpus-size-independent
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val n = graft.core.Tables(spark, sf).embeddings.count()
      val cb = Ann.codebookOf(spark, sf)
      assert(cb.length == math.min(Ann.IvfK.toLong, n),
        s"$sf: codebook ${cb.length} cells, corpus $n, IvfK ${Ann.IvfK}")
      // deterministic: same rule, same cells, every derivation
      assert(cb.map(_._1).toSeq == Ann.codebookOf(spark, sf).map(_._1).toSeq)
    }
  }

  test("ann_eval: metrics equal the spec's own recall/rank readout; summary row sums the pers") {
    val rows = Ann.evalLsh(spark, Sf).collect()
    val (summary, per) = rows.partition(_.getLong(0) == -1L)
    assert(summary.length == 1 && per.length == exact.size)
    val approx = topk(Ann.lsh(spark, Sf))
    // per-qid metrics replayed from the two rankings
    per.foreach { r =>
      val q = r.getLong(0)
      val a = approx(q).toSet
      val wantOverlap = exact(q).count(a.contains).toLong
      assert(r.getLong(1) == wantOverlap, s"q$q n_overlap")
      val nn2 = exact(q)(1) // truth rank-2: first non-self neighbor
      val wantRank = approx(q).indexOf(nn2) match {
        case -1 => None
        case i  => Some(i + 1L)
      }
      val gotRank = if (r.isNullAt(3)) None else Some(r.getLong(3))
      assert(gotRank == wantRank, s"q$q nn_rank")
      if (r.isNullAt(3)) assert(r.getLong(4) == 0L, s"q$q rr_micro for a miss")
      else assert(r.getLong(4) ==
        BigDecimal(1e6 / r.getLong(3))
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"q$q rr_micro")
    }
    // summary = exact sums of the per rows; mean recall == recallOf
    val s = summary.head
    assert(s.getLong(1) == per.map(_.getLong(1)).sum)
    assert(s.getLong(4) == per.map(_.getLong(4)).sum)
    assert(math.abs(s.getDouble(2) - recallOf(approx)) < 1e-6,
      s"summary recall ${s.getDouble(2)} vs ${recallOf(approx)}")
    assert(s.isNullAt(3))
  }

  test("ann_eval_ivf: the harness is ranking-agnostic (IVF scored identically)") {
    val rows = Ann.evalIvf(spark, Sf).collect()
    val (summary, per) = rows.partition(_.getLong(0) == -1L)
    assert(summary.length == 1 && per.length == exact.size)
    val approx = topk(Ann.ivf(spark, Sf))
    per.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == exact(q).count(approx(q).toSet.contains).toLong,
        s"q$q n_overlap")
    }
    assert(math.abs(summary.head.getDouble(2) - recallOf(approx)) < 1e-6)
    assert(summary.head.getLong(4) == per.map(_.getLong(4)).sum)
  }

  test("nprobe sweep: monotone recall; the full-probe row equals the IVF eval summary") {
    val rows = Ann.sweepNprobe(spark, Sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    assert(rows.keySet == Ann.NProbeSweep.map(_.toLong).toSet)
    // more probes never lose candidates: recall/overlap monotone
    val ordered = Ann.NProbeSweep.map(k => rows(k.toLong))
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(a._1 <= b._1 && a._2 <= b._2,
        s"sweep must be monotone: $ordered")
    case _ =>
    }
    // the bank's largest entry IS the gated ivf configuration: its
    // overlap and MRR numerator equal the eval harness's summary row
    val summary = Ann.evalIvf(spark, Sf).collect()
      .filter(_.getLong(0) == -1L).head
    assert(rows(Ann.NProbeSweep.max.toLong)._1 == summary.getLong(1),
      "full-probe overlap must equal ann_eval_ivf's summary")
    assert(rows(Ann.NProbeSweep.max.toLong)._3 == summary.getLong(4),
      "full-probe rr_micro must equal ann_eval_ivf's summary")
    assert(math.abs(rows(Ann.NProbeSweep.max.toLong)._2
      - summary.getDouble(2)) < 1e-6)
  }

  test("ann_eval: a recall-0 query still appears and deflates the summary (not silently dropped)") {
    import spark.implicits._
    // truth: q1 -> {10, 11}; q2 -> {20, 21}. approx: q1 perfect, q2
    // shares NOTHING with truth (the no-self-match worst case a
    // future ranking could produce)
    val truth = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 20L), (2L, 2L, 21L))
      .toDF("qid", "rank", "vec_id")
    val approx = Seq((1L, 1L, 10L), (1L, 2L, 11L), (2L, 1L, 90L), (2L, 2L, 91L))
      .toDF("qid", "rank", "vec_id")
    val rows = Ann.evalOf(approx, truth).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.keySet == Set(-1L, 1L, 2L),
      s"recall-0 query must appear: ${rows.keySet}")
    assert(rows(2L).getLong(1) == 0L && rows(2L).getDouble(2) == 0.0)
    assert(rows(2L).isNullAt(3) && rows(2L).getLong(4) == 0L)
    // k derives from the truth ranking (2 here, not the default 5):
    // q1 is perfect -> recall 1.0; summary = 2/4 with BOTH queries in
    // the denominator
    assert(rows(1L).getDouble(2) == 1.0)
    assert(rows(-1L).getDouble(2) == 0.5, s"summary ${rows(-1L)}")
  }

  test("range search: threshold honored, no self-matches, consistent with brute-force top-k") {
    val rs = Ann.rangeSearch(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rs.nonEmpty)
    rs.foreach { case (q, v, c) =>
      assert(c >= 0.15, s"below-threshold row ($q,$v,$c)")
      assert(q != v, "self-matches must be excluded")
    }
    // every non-self brute-force top-5 neighbor with cosine >= tau
    // must appear in the range result (range ⊇ thresholded top-k)
    val rsSet = rs.map(t => (t._1, t._2)).toSet
    val missed = Ann.bruteforce(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
      .filter { case (q, v, c) => q != v && c >= 0.15 }
      .filterNot { case (q, v, _) => rsSet.contains((q, v)) }
    assert(missed.isEmpty, s"top-k rows missing from range result: $missed")
  }
}
