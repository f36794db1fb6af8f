package graft

import org.apache.spark.sql.functions._

import graft.operators.Cluster

/** Integer-exact Lloyd's k-means: partitioning invariants,
  * improvement over rounds, and recovery of planted structure. */
class ClusterSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmeans: every vector is assigned exactly once") {
    val out = Cluster.embKmeans(spark, Sf).collect()
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(out.map(_.getLong(1)).sum == n, "assignments partition the corpus")
    assert(out.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(out.forall(_.getLong(2) >= 0L), "squared distances are non-negative")
  }

  test("kmeans: more Lloyd's rounds never worsen total inertia") {
    def inertia(iters: Int): Long =
      Cluster.kmeansDf(spark.read.parquet(s"$Sf/embeddings.parquet"), 8, iters)
        .agg(sum("inertia")).as[Long].head()
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1, s"inertia after 3 rounds ($i3) vs 1 round ($i1)")
  }

  test("semantic dedup equals brute-force pairs restricted to shared clusters") {
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
    val cid = Cluster.kmeansAssign(embs, 8, 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = embs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { // same accumulation order as CosineSimilarity
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val ids = vecs.keys.toArray.sorted
    val expect = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      v1 = ids(i); v2 = ids(j)
      if cid(v1) == cid(v2) && r6(cos(vecs(v1), vecs(v2))) >= 0.4
    } yield (v1, v2)).toSet
    val got = graft.operators.Dedup.semantic(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expect)
    assert(got.nonEmpty, "the planted near-dups should share clusters")
  }

  test("kmeans: recovers well-separated planted clusters") {
    // two tight blobs far apart: one round should already split them
    // perfectly, whatever the hash-seeded initialization picked
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 10.0f else -10.0f
      val jitter = (i / 2) * 0.01f
      (i.toLong, Array(base + jitter, base - jitter, base, base))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Cluster.kmeansDf(df, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.values.toSeq.sorted == Seq(10L, 10L),
      s"two balanced clusters expected, got $out")
  }

  test("emb_pca: recovers planted dominant directions in closed form") {
    // axis-aligned corpus: the second-moment matrix has one nonzero
    // cell, so the direction is exactly that axis at full scale, sign
    // flipped positive by the convention
    val axis = Seq(
      (0L, Array(0f, 0f, 3f, 0f)),
      (1L, Array(0f, 0f, -5f, 0f)),
      (2L, Array(0f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val a = Cluster.embPcaDf(axis).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a == Map(0 -> 0L, 1 -> 0L, 2 -> 1048576L, 3 -> 0L), a.toString)
    // collinear (3, 4) corpus: C ∝ [[9,12],[12,16]], whose dominant
    // eigenvector L∞-normalizes to (3/4, 1) — the integer fixed point
    // (786432, 1048576) lands in one round and stays
    val ray = Seq(
      (0L, Array(3f, 4f)), (1L, Array(-6f, -8f)), (2L, Array(1.5f, 2f)))
      .toDF("vec_id", "embedding")
    val b = Cluster.embPcaDf(ray).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(b == Map(0 -> 786432L, 1 -> 1048576L), b.toString)
    // empty corpus: defined empty output, not a crash
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Cluster.embPcaDf(empty).collect().isEmpty)
  }

  test("coreset: weighted sample is unbiased for the corpus total") {
    val rows = Cluster.embCoreset(spark, Sf).collect()
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(rows.nonEmpty && rows.length <= Cluster.CoresetBudget + 8,
      s"${rows.length} rows vs budget ${Cluster.CoresetBudget} + 8 floors")
    assert(rows.forall(_.getDouble(2) >= 1.0), "m_c is capped at n_c")
    // Σ weights ≡ N exactly (each cluster keeps exactly m_c of its
    // n_c members at weight n_c/m_c), modulo the round-6 on weights
    val sumW = rows.map(_.getDouble(2)).sum
    assert(math.abs(sumW - n) < 0.01 * n, s"Σweights $sumW vs N $n")
  }

  test("coreset: cluster labels agree with the assignment pass") {
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
    val cid = Cluster.kmeansAssign(embs, 8, 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = Cluster.embCoreset(spark, Sf).collect()
    rows.foreach(r => assert(cid(r.getLong(0)) == r.getLong(1)))
  }

  test("coreset plan: selection rides the bounded heap, never a Window") {
    val plan = Cluster.embCoreset(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topk_by_score"), "bounded-heap aggregate missing")
    assert(!plan.contains("Window"), "per-cluster Window would funnel " +
      "a 100 TB cluster through one task")
  }

  test("coreset: deterministic across runs and independent of layout") {
    val embs = spark.read.parquet(s"$Sf/embeddings.parquet")
    val a = Cluster.coresetDf(embs, 64, 8, 3).collect().toSeq
    val b = Cluster.coresetDf(embs.repartition(7), 64, 8, 3).collect().toSeq
    assert(a == b, "sample must not depend on partitioning")
  }

  test("kmeans fails fast on a non-finite embedding component") {
    // Spark's floor maps NaN to 0L silently — without the quantizer's
    // finiteness gate a corrupt vector would drag centroids toward the
    // origin for the whole trajectory instead of failing visibly
    val df = spark.range(2).select(col("id").as("vec_id"),
      when(col("id") === 1, array(lit(Float.NaN), lit(1f)))
        .otherwise(array(lit(0.5f), lit(0.25f))).as("embedding"))
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    val e = intercept[Exception] {
      Cluster.kmeansAssign(df, 1, 1).collect()
    }
    assert(messages(e).exists(_.contains("non-finite or out-of-range")),
      s"expected the quantizer's fail-fast, got: $e")
    // finite but out of range: floor(x*2^20) would saturate the long
    // cast and overflow the squared-distance kernel — same gate
    val big = spark.range(2).select(col("id").as("vec_id"),
      when(col("id") === 1, array(lit(1e13f), lit(1f)))
        .otherwise(array(lit(0.5f), lit(0.25f))).as("embedding"))
    val e2 = intercept[Exception] {
      Cluster.kmeansAssign(big, 1, 1).collect()
    }
    assert(messages(e2).exists(_.contains("non-finite or out-of-range")),
      s"expected the range fail-fast, got: $e2")
    // the streaming/serving twin SKIPS the same rows instead: one
    // corrupt vector must not crash-loop a stream or fail a serving job
    val skim = Cluster.finiteVectors(big).collect().map(_.getLong(0))
    assert(skim.toSeq == Seq(0L), "finiteVectors must keep only clean rows")
    // and the streaming trainer rides that skip path: a batch with a
    // poisoned row trains on the clean remainder instead of throwing
    // (a thrown micro-batch is replayed verbatim — a crash loop)
    val model = new graft.streaming.StreamingKmeans(1)
    model.processBatch(df, 0L)
    assert(model.activeCenters == 1, "clean rows must still train")
    assert(model.assign(df).collect().map(_.getLong(0)).toSeq == Seq(0L),
      "serving skips the corrupt row and scores the clean one")
  }

  test("kmeans fails fast on NULL and over-dim embeddings; skip twin drops them") {
    // dimension gate: |x| < 128 alone leaves d*2^56 Long headroom only
    // for d <= 128 — a 129-dim vector must be refused, not silently
    // overflow the squared-distance sum
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else String.valueOf(t.getMessage) +: messages(t.getCause)
    val wide = spark.range(2).select(col("id").as("vec_id"),
      when(col("id") === 1, array((0 until 129).map(_ => lit(0.5f)): _*))
        .otherwise(array(lit(0.5f), lit(0.25f))).as("embedding"))
    val e = intercept[Exception] { Cluster.kmeansAssign(wide, 1, 1).collect() }
    assert(messages(e).exists(_.contains("dim")),
      s"expected the dimension fail-fast, got: $e")
    // NULL component: previously quantized passed it through as a NULL
    // q element (poisoning the kernel); now the same fail-fast fires
    val holed = spark.range(2).select(col("id").as("vec_id"),
      when(col("id") === 1, array(lit(null).cast("float"), lit(1f)))
        .otherwise(array(lit(0.5f), lit(0.25f))).as("embedding"))
    val e2 = intercept[Exception] { Cluster.kmeansAssign(holed, 1, 1).collect() }
    assert(messages(e2).exists(_.contains("NULL")),
      s"expected the NULL-component fail-fast, got: $e2")
    // the skip twin treats all three shapes as corrupt rows to drop
    val nulled = spark.range(2).select(col("id").as("vec_id"),
      when(col("id") === 1, lit(null).cast("array<float>"))
        .otherwise(array(lit(0.5f), lit(0.25f))).as("embedding"))
    for (df <- Seq(wide, holed, nulled)) {
      assert(Cluster.finiteVectors(df).collect().map(_.getLong(0)).toSeq
        == Seq(0L), "finiteVectors must keep only the clean row")
    }
  }

  test("kmeans trajectory matches a scalar Lloyd's fold on random vectors") {
    // third independent witness beside the unrolled-CTE oracle and the
    // closed-form specs: a plain-Scala replay of the exact integer
    // recurrence (portable-hash seed order, strict-< argmin with
    // first-lowest-cid ties, truncating centroid division, empty
    // clusters keeping their centroid) on seeded random float vectors
    val rnd = new scala.util.Random(55001)
    for (trial <- 1 to 2) {
      val n = 24 + trial * 6; val dim = 4; val k = 3; val iters = 3
      val vecs = (0L until n.toLong).map { id =>
        (id, Array.fill(dim)(rnd.nextFloat() * 2f - 1f), 0)
      }
      def quant(v: Array[Float]): Array[Long] =
        v.map(x => math.floor(x.toDouble * Cluster.Scale).toLong)
      def h(id: Long): Long = graft.functions.SketchKernel.h60(
        org.apache.spark.unsafe.types.UTF8String.fromString(id.toString))
      var cents = vecs.sortBy(v => (h(v._1), v._1)).take(k)
        .map(v => quant(v._2)).toArray
      val q = vecs.map(v => v._1 -> quant(v._2)).toMap
      var ref = Map.empty[Long, (Int, Long)]
      for (r <- 1 to iters) {
        ref = q.map { case (id, xs) =>
          var best = 0; var bd = Long.MaxValue
          for (c <- 0 until k) {
            var acc = 0L
            for (i <- 0 until dim) {
              val d = xs(i) - cents(c)(i); acc += d * d
            }
            if (acc < bd) { bd = acc; best = c }
          }
          id -> (best, bd)
        }
        if (r < iters) {
          val next = cents.map(_.clone())
          ref.groupBy(_._2._1).foreach { case (c, members) =>
            for (i <- 0 until dim)
              next(c)(i) = members.keys.map(q(_)(i)).sum / members.size
          }
          cents = next
        }
      }
      val got = Cluster.kmeansAssign(
        vecs.toSeq.toDF("vec_id", "embedding", "label"), k, iters)
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2))))
        .toMap
      assert(got == ref, s"trial $trial")
    }
  }
}
