package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Vectors

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY.md §2 E). Query set = `vec_id < 10` (broadcast side).
  *
  * Scale shape: brute force is the correctness baseline — a broadcast
  * of the (small) query set against a full scan, no shuffle at all on
  * the corpus side until the per-query top-k (one shuffle on qid).
  * The LSH and IVF variants prune the scan to matching buckets/cells:
  * at 100 TB the corpus side is bucketed-by-cell on disk, so a probe
  * touches only its cells' files; here the cell assignment happens
  * inline (same plan shape, no pre-materialized index).
  */
object Ann {

  private val NumQueries = 10
  private val TopK = 5

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding"))

  private def queriesDf(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir).filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  private def topkPerQuery(scored: DataFrame, k: Int = TopK): DataFrame = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cosine"))
      .orderBy("qid", "rank")
  }

  /** Exact top-k cosine neighbors: broadcast queries × corpus scan.
    * (Self-match ranks first at cosine 1.0 — kept, it's the standard
    * sanity row.) Ranking uses the 6dp-rounded cosine + vec_id so the
    * order is reproducible on both sides of the oracle. */
  def bruteforce(spark: SparkSession, dir: String): DataFrame = {
    val scored = emb(spark, dir)
      .crossJoin(broadcast(queriesDf(spark, dir)))
      .select(col("qid"), col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("qe")), 6).as("cosine"))
    topkPerQuery(scored)
  }

  // --- random-hyperplane LSH --------------------------------------

  private val Dim = 64
  private val NBits = 8  // bits per table
  private val NTables = 4

  /** Deterministic Gaussian-ish hyperplanes (fixed-seed PRNG — same
    * planes on every run and every executor; shipped as literals). */
  private lazy val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NTables * NBits, Dim)(rnd.nextGaussian().toFloat)
  }

  /** sign(v·w) via the codegen'd cosine expression (norms are
    * positive, so the cosine's sign IS the dot's sign) — one fused
    * loop per plane instead of an interpreted zip_with/aggregate
    * lambda chain. */
  private def signBit(v: Column, w: Array[Float], bit: Int): Column =
    when(Vectors.cosineSim(v, typedlit(w)) > 0, lit(1 << bit)).otherwise(lit(0))

  /** Bucket key of table `t`: "t#" + 8 sign bits over that table's
    * hyperplanes. */
  private def lshKey(v: Column, t: Int): Column =
    concat(lit(s"$t#"),
      (0 until NBits).map(b => signBit(v, planes(t * NBits + b), b))
        .reduce(_ + _).cast("string"))

  private def corpusKeys(v: Column): Column =
    array((0 until NTables).map(t => lshKey(v, t)): _*)

  /** Per-table multiprobe: the bucket plus its 8 Hamming-1 neighbors
    * (sign-boundary flips dominate misses), across all 4 tables. */
  private def probeKeys(v: Column): Column = {
    val keys = for {
      t <- 0 until NTables
      bucket = (0 until NBits).map(b => signBit(v, planes(t * NBits + b), b)).reduce(_ + _)
      k <- bucket +: (0 until NBits).map(j => bucket.bitwiseXOR(lit(1 << j)))
    } yield concat(lit(s"$t#"), k.cast("string"))
    array(keys: _*)
  }

  /** Multi-table random-hyperplane LSH top-k: 4 independent 8-bit
    * tables; a corpus vector lands in one bucket per table, a query
    * probes its bucket + Hamming-1 neighbors in every table, and only
    * the union of candidates is scored. One shuffle on the bucket
    * key. Approximate — recall vs [[bruteforce]] asserted in AnnSpec
    * (the synthetic embeddings are near-uniform, the hardest case for
    * hyperplane LSH; clustered real embeddings fare far better). */
  def lsh(spark: SparkSession, dir: String): DataFrame = {
    val corpus = emb(spark, dir)
      .select(col("vec_id"), col("embedding"),
        explode(corpusKeys(col("embedding"))).as("bucket"))
    val probes = queriesDf(spark, dir)
      .select(col("qid"), col("qe"), explode(probeKeys(col("qe"))).as("bucket"))
    val scored = corpus.join(broadcast(probes), Seq("bucket"))
      .select(col("qid"), col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("qe")), 6).as("cosine"))
      .distinct()
    topkPerQuery(scored)
  }

  // --- IVF-style coarse quantizer ---------------------------------

  private val CentroidStride = 29
  private val NProbe = 4

  /** IVF top-k: a deterministic subsample of the corpus acts as the
    * coarse codebook (every 29th vector); each vector is assigned to
    * its nearest centroid cell, queries probe their 4 nearest cells.
    * At 100 TB the cell assignment is a write-time bucketing; the
    * plan shape (broadcast codebook, argmax-by-window, cell-key join)
    * is identical. Recall asserted in AnnSpec. */
  def ivf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = e.filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))

    def assign(df: DataFrame, idCol: String, vecCol: String, n: Int): DataFrame = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("csim").desc, col("cent_id"))
      df.crossJoin(broadcast(centroids))
        .withColumn("csim", Vectors.cosineSim(col(vecCol), col("ce")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= n)
        .drop("ce", "csim", "crank")
    }

    val cells = assign(e, "vec_id", "embedding", 1)
      .withColumnRenamed("cent_id", "cell")
    val probes = assign(queriesDf(spark, dir), "qid", "qe", NProbe)
      .withColumnRenamed("cent_id", "cell")
    val scored = cells.join(broadcast(probes), Seq("cell"))
      .select(col("qid"), col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("qe")), 6).as("cosine"))
      .distinct()
    topkPerQuery(scored)
  }

  /** Quantized search: int8-quantize the corpus (4× storage density —
    * the write-time representation at 100 TB), score candidates on
    * the dequantized codes, keep a 10× candidate margin, then rerank
    * exactly on the original floats. Quantization noise (~1e-2 on
    * cosine) only has to keep true neighbors inside the margin, not
    * rank them — AnnSpec asserts recall vs [[bruteforce]]. */
  def quantized(spark: SparkSession, dir: String): DataFrame = {
    val rerankMargin = TopK * 10
    val corpus = emb(spark, dir)
      .withColumn("scale", Vectors.quantScale(col("embedding")))
      .withColumn("codes", Vectors.quantize(col("embedding"), col("scale")))
      // real deployments persist codes+scale and drop the floats;
      // keep the floats here for the exact rerank join below
      .cache()
    val q = queriesDf(spark, dir)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("vec_id"))
    val candidates = corpus
      .crossJoin(broadcast(q))
      .select(col("qid"), col("qe"), col("vec_id"),
        Vectors.cosineSim(
          Vectors.dequantize(col("codes"), col("scale")), col("qe")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= rerankMargin)
    val exact = candidates
      .join(corpus.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("qid"), col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("qe")), 6).as("cosine"))
    topkPerQuery(exact)
  }

  /** Write-time IVF index: the corpus laid out partitioned by cell.
    * At 100 TB this is how ANN actually serves — cell assignment is
    * paid once at ingest; a probe then reads only its cells' files
    * (dynamic partition pruning through the broadcast probe join,
    * asserted in AnnSpec). */
  def buildIvfIndex(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val e = emb(spark, dir)
    val centroids = e.filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("csim").desc, col("cent_id"))
    e.crossJoin(broadcast(centroids))
      .withColumn("csim", Vectors.cosineSim(col("embedding"), col("ce")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") === 1)
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(indexPath)
  }

  /** Probe a pre-built IVF index: identical results to the inline
    * [[ivf]] (same codebook), but the corpus side is a
    * partition-pruned read instead of a full scan + assignment. */
  def ivfIndexed(spark: SparkSession, dir: String, indexPath: String): DataFrame = {
    val e = emb(spark, dir)
    val centroids = e.filter(col("vec_id") % CentroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("csim").desc, col("cent_id"))
    val probes = queriesDf(spark, dir)
      .crossJoin(broadcast(centroids))
      .withColumn("csim", Vectors.cosineSim(col("qe"), col("ce")))
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= NProbe)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
    val idx = spark.read.parquet(indexPath)
    val scored = idx.join(broadcast(probes), Seq("cell"))
      .select(col("qid"), col("vec_id"),
        round(Vectors.cosineSim(col("embedding"), col("qe")), 6).as("cosine"))
      .distinct()
    topkPerQuery(scored)
  }
}
