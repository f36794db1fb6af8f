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
}
