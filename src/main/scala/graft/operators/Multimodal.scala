package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal column plumbing (SURVEY.md §2 G): media as opaque
  * `binary` payloads + typed metadata, decoded partition-wise in
  * fixed-size batches (the shape a vectorized image/audio decoder
  * needs). The decode itself is a STUB — see [[Multimodal.decodeBatch]]
  * — because no media codec ships in this environment; everything
  * around it (schema, encoders, partitioning, batch loop, downstream
  * relational ops) is real and oracle-checked.
  */
object Multimodal {

  /** An opaque media blob: what a 100 TB corpus actually stores —
    * bytes plus routing metadata, never decoded until needed. */
  final case class MediaBlob(doc_id: Long, fmt: String, payload: Array[Byte])

  /** Typed metadata a decoder would extract. */
  final case class MediaMeta(doc_id: Long, fmt: String, width: Int,
      height: Int, n_frames: Int, size_bytes: Long)

  /** Batch size for the partition-wise decode loop — a real decoder
    * amortizes codec setup over a batch (GPU transfer, JNI call). */
  private val DecodeBatchSize = 32

  // ==================================================================
  // STUB DECODE — deterministic fake. A real deployment replaces this
  // one function with an image/audio codec call; the batch signature
  // (Seq[MediaBlob] => Seq[MediaMeta]) is the integration point.
  // Deterministic so the driver oracle can mirror it in SQL.
  // ==================================================================
  private[graft] def decodeBatch(batch: Seq[MediaBlob]): Seq[MediaMeta] =
    batch.map { b =>
      val first = if (b.payload.nonEmpty) b.payload(0) & 0x7f else 0
      MediaMeta(
        doc_id = b.doc_id,
        fmt = b.fmt,
        width = 64 + (b.payload.length % 512),
        height = 64 + (first % 64),
        n_frames = if (b.fmt == "video") 1 + (b.payload.length % 100) else 1,
        size_bytes = b.payload.length.toLong)
    }

  /** Synthesize the blob table from documents (the corpus here has no
    * real media; payload = utf-8 bytes, fmt round-robins the three
    * modalities). Columnar ops only — the bytes never reach the
    * driver. */
  def blobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("fmt"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaBlob]
  }

  /** Partition-wise batched decode: the distributed plumbing around
    * the stub. No shuffle — metadata extraction is map-side; the
    * Dataset encoder keeps rows off the driver. */
  def decodeMeta(blobs: Dataset[MediaBlob]): Dataset[MediaMeta] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeBatch))
  }

  /** One sampled video frame's extracted feature (brightness stands in
    * for whatever a real decoder would emit per frame). */
  final case class FrameSample(doc_id: Long, frame_idx: Int, brightness: Int)

  /** STUB frame decode, one batch (same integration contract as
    * [[decodeBatch]]): uniform-stride sampling of ≤ k frames per video
    * — the standard way a training pipeline thins video to frames —
    * with a deterministic per-frame byte probe standing in for the
    * pixel decode. Deterministic ⇒ oracle-mirrorable in SQL. */
  private[graft] def sampleFramesBatch(batch: Seq[MediaBlob],
      k: Int): Seq[FrameSample] =
    batch.filter(b => b.fmt == "video" && b.payload.nonEmpty).flatMap { b =>
      val len = b.payload.length
      val n = 1 + len % 100                       // stub frame count (see decodeBatch)
      val stride = math.ceil(n / k.toDouble).toInt
      (0 until n by stride).map { fi =>
        FrameSample(b.doc_id, fi,
          b.payload(((fi.toLong * 997L) % len).toInt) & 0x7f)
      }
    }

  /** Partition-wise batched frame sampling: map-side only, no shuffle;
    * one blob fans out to ≤ k frame rows. At 100 TB this is the step
    * that turns a video corpus into a frame-level training table. */
  def sampleFrames(blobs: Dataset[MediaBlob], k: Int = 8): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(
      _.grouped(DecodeBatchSize).flatMap(b => sampleFramesBatch(b, k)))
  }

  /** Per-video stats over the sampled frames — frame extraction
    * feeding straight back into declarative aggregation.
    * Oracle-checked (deterministic stub). */
  def frameSampleStats(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(blobs(spark, dir))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sampled"),
        max("frame_idx").as("last_frame"),
        round(avg("brightness"), 6).as("avg_brightness"))
      .sortWithinPartitions("doc_id")

  /** Per-format metadata stats — the downstream relational op that
    * proves decoded metadata joins back into the declarative world.
    * Oracle-checked: the stub is deterministic, so DuckDB mirrors it
    * straight from `documents`. */
  def metaStats(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(blobs(spark, dir))
      .groupBy(col("fmt"))
      .agg(count(lit(1)).as("n"),
        round(avg("width"), 6).as("avg_w"),
        round(avg("height"), 6).as("avg_h"),
        max("n_frames").as("max_frames"),
        sum("size_bytes").as("total_bytes"))
      .orderBy("fmt")

  /** Resize planning for the image corpus: target dimensions that fit
    * each image into 224×224 (the standard vision-model input)
    * preserving aspect ratio — pure INTEGER arithmetic (`div`), so
    * the plan is engine-exact and oracle-checked. The column-only
    * pass runs map-side over the decoded metadata; the pixel
    * resample itself belongs in the batched decode (stubbed here),
    * which would consume these (new_w, new_h) pairs per batch. */
  def resizeSpecs(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(blobs(spark, dir)).toDF()
      .filter(col("fmt") === "image")
      .select(col("doc_id"), col("width"), col("height"),
        when(col("width") >= col("height"), lit(224))
          .otherwise(expr("(width * 224) div height")).as("new_w"),
        when(col("width") >= col("height"), expr("(height * 224) div width"))
          .otherwise(lit(224)).as("new_h"))
      .sortWithinPartitions("doc_id")

  /** One image's byte histogram — the feature-extraction stand-in
    * (a real deployment swaps this for an embedding model call; the
    * batch signature is the same integration point as
    * [[decodeBatch]]). 8 bins over the 7-bit byte values. */
  final case class ByteHist(doc_id: Long, bins: Array[Long])

  private[graft] def featureBatch(batch: Seq[MediaBlob]): Seq[ByteHist] =
    batch.filter(_.fmt == "image").map { b =>
      val bins = new Array[Long](8)
      b.payload.foreach(p => bins((p & 0x7f) / 16) += 1L)
      ByteHist(b.doc_id, bins)
    }

  /** Feature extraction over the image corpus: partition-wise batched
    * byte histograms (map-side, no shuffle — one fixed-size vector
    * per image regardless of payload size), exploded to a relational
    * (doc_id, bin, cnt) feature table. Deterministic ⇒ oracle-checked
    * (DuckDB rebuilds the histogram from the character codes). */
  def byteFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobs(spark, dir)
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(featureBatch))
      .select(col("doc_id"), posexplode(col("bins")))
      .select(col("doc_id"), col("pos").cast("int").as("bin"),
        col("col").as("cnt"))
      .sortWithinPartitions("doc_id", "bin")
  }

  /** Quantized-histogram signature for one image: per-mille bin
    * shares floored to buckets of `q` per-mille, absent bins skipped,
    * joined `-` in bin order. Pure integer arithmetic — the DuckDB
    * oracle rebuilds the identical string. Two images whose byte
    * distributions differ by less than the bucket width collide —
    * that's the point: collision = near-duplicate. */
  private[graft] def histSig(bins: Array[Long], q: Int): String = {
    val n = bins.sum
    bins.filter(_ > 0).map(c => (c * 1000 / n) / q).mkString("-")
  }

  /** Near-duplicate media detection — the multimodal twin of
    * [[Dedup]]'s text operators: partition-wise batched feature
    * extraction (the byte histogram standing in for a perceptual
    * hash / embedding call), a per-image signature computed MAP-SIDE
    * (fixed-size state per image regardless of payload bytes), and
    * one groupBy on the short signature string. No pairwise compare
    * anywhere: like SimHash bucketing, duplicate sets fall out of an
    * exact group-by on the quantized signature, so the shuffle
    * carries |images| signature rows, not payloads, and never N².
    * Empty payloads are excluded (no distribution to compare). */
  def nearDupMedia(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    blobs(spark, dir)
      .filter(_.payload.nonEmpty)
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(featureBatch))
      .map(h => (h.doc_id, histSig(h.bins, 25)))
      .toDF("doc_id", "sig")
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .sortWithinPartitions("sig")
  }
}
