package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Shingles._
import graft.functions.SketchAggs
import graft.functions.Vectors

/** Deduplication operator block (SURVEY.md §2 D).
  *
  * Scale shape: every operator here is *bucket-join* structured —
  * candidate pairs come from an equi-join on a bucket key (text hash,
  * shared shingle, LSH band, simhash chunk, blocking label), never
  * from a cross join. At 100 TB the only shuffles are those bucket-key
  * exchanges, and frequent-bucket skew is bounded (AQE skew split +
  * the shingle-df cap noted below).
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * The classic first pass of any pipeline — one shuffle on the
    * 128-bit hash, output is one row per distinct content. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).documents
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("h")

  private def docGrams(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), grams3(col("text")).as("grams"))

  /** N-gram Jaccard near-dup pairs via inverted-index self-join:
    * explode distinct shingles, join docs sharing a shingle, count
    * shared shingles per pair, compute Jaccard from the per-doc set
    * sizes. Candidate generation is |postings|² per shingle — bounded
    * at scale by dropping ubiquitous shingles (df cap), which cannot
    * remove a pair above the threshold unless *all* its shared
    * shingles are ubiquitous (τ·|union| > cap ⇒ safe). Kept uncapped
    * here to stay bit-identical with the SQL oracle at test scale. */
  def ngramJaccard(spark: SparkSession, dir: String, tau: Double = 0.1): DataFrame =
    ngramJaccardDf(Tables(spark, dir).documents, tau)

  def ngramJaccardDf(docs: DataFrame, tau: Double,
      pruneSingletons: Boolean = false): DataFrame = {
    val g = docGrams(docs).cache()
    val sizes = g.select(col("doc_id"), size(col("grams")).as("n"))
    // materialized before the self-join — otherwise the shingling
    // subtree executes once per join side
    val allPosts = g.select(col("doc_id"), explode(col("grams")).as("gram"))
    // Scale knob: on natural text most shingles are unique (df=1) and
    // can't contribute a pair — pre-aggregating df and semi-joining
    // shrinks the self-join input dramatically at 100 TB. Exact
    // either way. Off by default: this synthetic corpus has a tiny
    // vocabulary (avg df ≈ 16, no singletons), so the extra shuffle
    // costs more than it saves at test scale.
    val posts = (if (pruneSingletons) {
      val dfs = allPosts.groupBy(col("gram"))
        .agg(count(lit(1)).as("df")).filter(col("df") > 1).select("gram")
      allPosts.join(dfs, Seq("gram"), "left_semi")
    } else allPosts).cache()
    val pairs = posts.as("a")
      .join(posts.as("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .select(col("d1"), col("d2"), col("inter"),
        round(col("inter") / (col("s1.n") + col("s2.n") - col("inter")), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("d1", "d2")
  }

  /** MinHash + banded LSH near-dup pairs: k=32 minhashes, 8 bands of
    * 4 rows (candidate probability ≈ 1-(1-j⁴)⁸ — steep around j≈0.5).
    * Candidates come from one shuffle on band keys; exact Jaccard
    * verification joins the shingle sets back only for candidates.
    * Rows-only oracle (hash family isn't portable SQL) — recall vs
    * exact Jaccard is asserted in DedupSpec. */
  def minhashLsh(spark: SparkSession, dir: String, tau: Double = 0.5,
      k: Int = 32, bands: Int = 8): DataFrame =
    minhashLshDf(Tables(spark, dir).documents, tau, k, bands)

  def minhashLshDf(docs: DataFrame, tau: Double, k: Int = 32,
      bands: Int = 8): DataFrame = {
    val g = docGrams(docs).cache()
    // Exploded-aggregate minhash: hash each shingle once, build the
    // whole k-entry signature in ONE custom TypedImperativeAggregate
    // column (long[k] buffer, map-side partial mins — see
    // functions.MinHashAgg; bit-compatible with k separate
    // min(xxhash64(i, h)) columns but one buffer instead of k agg
    // slots). The nested-HOF formulation (Shingles.minhashSignature)
    // is interpreted per element and measured 20× slower.
    val r = k / bands
    val base = g.select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
    val sig = base.groupBy(col("doc_id"))
      .agg(SketchAggs.minhashAgg(col("h"), k).as("sig"))
    val bandKeyCols = (0 until bands).map(b =>
      concat(lit(s"$b#"),
        xxhash64((b * r until (b + 1) * r).map(i =>
          element_at(col("sig"), i + 1)): _*).cast("string")))
    val buckets = sig.select(col("doc_id"),
      explode(array(bandKeyCols: _*)).as("bk")).cache()
    val cands = buckets.as("a")
      .join(buckets.as("b"),
        col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    cands
      .join(g.as("g1"), col("d1") === col("g1.doc_id"))
      .join(g.as("g2"), col("d2") === col("g2.doc_id"))
      .select(col("d1"), col("d2"),
        round(jaccard(col("g1.grams"), col("g2.grams")), 6).as("jaccard"))
      .filter(col("jaccard") >= tau)
      .orderBy("d1", "d2")
  }

  /** SimHash near-dup pairs: 64-bit signature, 4×16-bit chunk
    * bucketing (pigeonhole-complete for Hamming ≤ 3), verify with
    * bit_count(xor). Rows-only oracle — spec-tested. */
  def simhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame =
    simhashDf(Tables(spark, dir).documents, maxHamming)

  def simhashDf(docs: DataFrame, maxHamming: Int): DataFrame = {
    // Same exploded-aggregate shape as minhash: one xxhash64 per
    // shingle, one custom SimHashAgg column (long[64] vote buffer,
    // sign-packed on eval — bit-compatible with 64 sum-of-vote
    // columns, see SketchAggsSpec).
    val sigs = docGrams(docs)
      .select(col("doc_id"), explode(col("grams")).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("h"))
      .groupBy(col("doc_id"))
      .agg(SketchAggs.simhashAgg(col("h")).as("sim"))
      .cache()
    val chunks = sigs.select(col("doc_id"), col("sim"),
      explode(simhashChunks(col("sim"))).as("ck")).cache()
    chunks.as("a")
      .join(chunks.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        hamming(col("a.sim"), col("b.sim")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  /** Connected components over near-dup pairs — the step that turns
    * pairwise similarity into dedup groups (keep the min doc_id per
    * component, drop the rest). Distributed min-label propagation:
    * each iteration joins labels across edges and keeps the minimum;
    * converges in O(component diameter) rounds (typically ≤ 5 for
    * near-dup clusters; 20-round safety cap). Each round is one
    * shuffle; lineage is truncated per round (localCheckpoint) so the
    * loop survives arbitrarily many iterations at scale. */
  def components(pairs: DataFrame): DataFrame = {
    // materialize the pair derivation once — the union below references
    // it twice, and without this the whole upstream (shingling +
    // self-join) executes per side
    val p = pairs.cache()
    val edges = p.select(col("d1").as("src"), col("d2").as("dst"))
      .unionAll(p.select(col("d2").as("src"), col("d1").as("dst")))
      .distinct().cache()
    var labels = edges.select(col("src").as("node"))
      .distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val viaNeighbors = edges
        .join(labels, col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(min("comp").as("ncomp"))
      // the changed flag rides along into the checkpoint so the
      // convergence check is a cheap scan, not another join job
      val next = labels
        .join(viaNeighbors, col("node") === col("dst"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("ncomp2"),
          (least(col("comp"), coalesce(col("ncomp"), col("comp"))) =!= col("comp"))
            .as("ch"))
        .withColumnRenamed("ncomp2", "comp")
        .localCheckpoint()
      changed = next.filter(col("ch")).count()
      labels = next.drop("ch")
      rounds += 1
    }
    labels.select(col("node").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
  }

  /** Dedup groups from n-gram Jaccard pairs: every doc that has a
    * near-dup, labeled with its component (= min doc_id in the
    * cluster); `keep = doc_id == component`. */
  def ngramComponents(spark: SparkSession, dir: String,
      tau: Double = 0.1): DataFrame =
    components(ngramJaccardDf(Tables(spark, dir).documents, tau))

  /** Embedding cosine near-dup pairs, blocked by the `label` column
    * (the pre-clustering blocking pattern: at 100 TB the block key is
    * a coarse quantizer cell; here the provided label plays that
    * role). Oracle-checked via DuckDB list_cosine_similarity over
    * DOUBLE[] casts; spec additionally pins the codegen expression to
    * the HOF cosine. */
  def embedding(spark: SparkSession, dir: String, tau: Double = 0.4): DataFrame =
    embeddingDf(Tables(spark, dir).embeddings, tau)

  def embeddingDf(embs: DataFrame, tau: Double): DataFrame = {
    val e = embs.select(col("vec_id"), col("embedding"), col("label"))
    e.as("a")
      .join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(Vectors.cosineSim(col("a.embedding"), col("b.embedding")), 6)
          .as("cosine"))
      .filter(col("cosine") >= tau)
      .orderBy("v1", "v2")
  }
}
