package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  // ==================================================================
  // REAL DECODE — a genuine pure-JVM image codec path (javax.imageio,
  // BMP): the corpus is rendered as real 24-bit BMP files whose
  // dimensions and pixels are deterministic functions of the row, so
  // the decoder is REAL (ImageIO parses actual headers, strides, and
  // bottom-up row order) while the oracle stays generated: DuckDB
  // recomputes what the decode MUST yield from the planted parameters
  // (BMP is lossless by construction). The stub path above is kept as
  // the integration cross-reference for codecs that don't ship in a
  // JRE (video/audio).
  // ==================================================================

  /** Planted image geometry — ONE Scala source of truth shared by the
    * renderer, the Spark queries, and the generated DuckDB oracles.
    * Width rides doc_id, height rides the codepoint text length
    * (computed engine-side by `length(text)` so both engines count
    * codepoints), pixels are a linear congruential gradient. */
  private[graft] def plantedW(docId: Long): Int = (8 + docId % 24).toInt
  private[graft] def plantedH(tlen: Int): Int = 8 + tlen % 16
  private[graft] def plantedGray(docId: Long, x: Int, y: Int): Int =
    ((x * 7L + y * 13L + docId * 31L) % 256L).toInt

  /** Minimal 24-bit uncompressed BMP encoder (BITMAPINFOHEADER,
    * bottom-up rows, 4-byte row padding, B-G-R pixel order) — pure
    * JVM, so the decode side exercises a REAL codec without any
    * native library. `pix(x, y)` is top-origin gray (B = G = R). */
  private[graft] def bmpBytes(w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = {
    val rowSize = (3 * w + 3) / 4 * 4
    val fileSize = 54 + rowSize * h
    val out = new Array[Byte](fileSize)
    def le32(off: Int, v: Int): Unit = {
      out(off) = (v & 0xff).toByte
      out(off + 1) = ((v >> 8) & 0xff).toByte
      out(off + 2) = ((v >> 16) & 0xff).toByte
      out(off + 3) = ((v >> 24) & 0xff).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    le32(2, fileSize); le32(10, 54)           // data offset
    le32(14, 40)                              // BITMAPINFOHEADER
    le32(18, w); le32(22, h)                  // positive h = bottom-up
    out(26) = 1                               // planes
    out(28) = 24                              // bpp
    le32(30, 0)                               // BI_RGB
    le32(34, rowSize * h)
    var y = 0
    while (y < h) {
      val rowOff = 54 + (h - 1 - y) * rowSize // bottom-up file order
      var x = 0
      while (x < w) {
        val g = (pix(x, y) & 0xff).toByte
        out(rowOff + 3 * x) = g               // B
        out(rowOff + 3 * x + 1) = g           // G
        out(rowOff + 3 * x + 2) = g           // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** The rendered image corpus: one real BMP per document, generated
    * map-side (at 100 TB this column arrives from `binaryFile`
    * ingestion — [[graft.sources.IO]]; rendering here plants a
    * corpus whose decode is provable). No shuffle, bytes never reach
    * the driver. */
  def imageBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id"), length(col("text")).cast("int").as("tlen"))
      .as[(Long, Int)]
      .map { case (id, tlen) =>
        MediaBlob(id, "image",
          bmpBytes(plantedW(id), plantedH(tlen), plantedGray(id, _, _)))
      }
  }

  /** Planted pixels encoded as `fmt` ("bmp" | "png" | "jpeg" — the
    * formats real corpora carry; javax.imageio bundles all three
    * writers). PNG is lossless, so the PNG corpus decodes to
    * byte-identical pixels and every pixel-level fingerprint
    * (hist/dHash/aHash/pHash) matches the gated BMP chain exactly
    * (MultimodalSpec pins it). JPEG is lossy by design — only
    * geometry (width/height/frames) is format-invariant there. */
  private[graft] def imageBytes(fmt: String, w: Int, h: Int,
      pix: (Int, Int) => Int): Array[Byte] = fmt match {
    case "bmp" => bmpBytes(w, h, pix)
    case f =>
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = pix(x, y) & 0xff
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, f, bos),
        s"mm_encode: no ImageIO writer for format $f")
      bos.toByteArray
  }

  /** The planted corpus re-encoded per-doc by `fmtFor(doc_id)` — the
    * format-mixed corpus a real ingest sees (the decode tier below is
    * already format-agnostic: ImageIO sniffs each payload). The
    * MediaBlob.fmt column carries the true format so downstream
    * per-format routing/stats stay possible. */
  private[graft] def imageBlobsAs(spark: SparkSession, dir: String,
      fmtFor: Long => String): Dataset[MediaBlob] = {
    import spark.implicits._
    Tables(spark, dir).documents
      .select(col("doc_id"), length(col("text")).cast("int").as("tlen"))
      .as[(Long, Int)]
      .map { case (id, tlen) =>
        val f = fmtFor(id)
        MediaBlob(id, f,
          imageBytes(f, plantedW(id), plantedH(tlen), plantedGray(id, _, _)))
      }
  }

  /** BMP/PNG-mixed corpus (both lossless — every pixel-level query
    * must produce identical rows to the all-BMP chain). */
  private[graft] def imageBlobsMixedLossless(spark: SparkSession,
      dir: String): Dataset[MediaBlob] =
    imageBlobsAs(spark, dir, id => if (id % 2 == 0) "bmp" else "png")

  /** REAL batched decode: javax.imageio parses each BMP's header and
    * pixel grid. Same batch integration contract as the stub
    * [[decodeBatch]] — swap-in point for any other codec. */
  private[graft] def decodeImageBatch(batch: Seq[MediaBlob]): Seq[MediaMeta] =
    batch.map { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload))
      require(img != null, s"mm_decode: undecodable image, doc ${b.doc_id}")
      MediaMeta(b.doc_id, b.fmt, img.getWidth, img.getHeight,
        n_frames = 1, size_bytes = b.payload.length.toLong)
    }

  /** REAL batched pixel decode → 8-bin gray histogram per image (the
    * feature-extraction stand-in over genuine decoded pixels; gray =
    * blue channel, images are rendered achromatic). */
  private[graft] def pixelHistBatch(batch: Seq[MediaBlob]): Seq[ByteHist] =
    batch.map { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload))
      require(img != null, s"mm_decode: undecodable image, doc ${b.doc_id}")
      val bins = new Array[Long](8)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          bins((img.getRGB(x, y) & 0xff) / 32) += 1L
          x += 1
        }
        y += 1
      }
      ByteHist(b.doc_id, bins)
    }

  /** Per-shard metadata stats over the REALLY-decoded corpus — widths
    * and heights read back out of actual BMP headers by ImageIO, then
    * declarative aggregation. Oracle-checked BY CONSTRUCTION: DuckDB
    * recomputes the planted geometry (and the BMP file-size formula
    * `54 + h·rowSize`, which doubles as a check on the encoder's
    * stride math). Map-side decode, one tiny 4-group aggregate. */
  def decodeMetaReal(spark: SparkSession, dir: String): DataFrame =
    decodeMetaRealOf(imageBlobs(spark, dir))

  /** [[decodeMetaReal]] over ANY blob source (format-agnostic —
    * ImageIO sniffs BMP/PNG/JPEG per payload; spec surface for the
    * mixed-format corpora). */
  private[graft] def decodeMetaRealOf(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(decodeImageBatch))
      .groupBy((col("doc_id") % 4).as("shard"))
      .agg(count(lit(1)).as("n"),
        round(avg("width"), 6).as("avg_w"),
        round(avg("height"), 6).as("avg_h"),
        sum("size_bytes").as("total_bytes"))
      .orderBy("shard")
  }

  /** Corpus-wide gray histogram over REALLY-decoded pixels: batched
    * map-side decode → fixed-size per-image bins → one 8-group
    * aggregate. The oracle regenerates every pixel from the planted
    * gradient (lossless BMP ⇒ exact), so a single off-by-one in
    * stride, padding, or bottom-up row order fails the hash. */
  def pixelHistReal(spark: SparkSession, dir: String): DataFrame =
    pixelHistRealOf(imageBlobs(spark, dir))

  /** [[pixelHistReal]] over the FORMAT-MIXED lossless corpus — gated
    * against the SAME planted-pixel oracle (see
    * [[nearDupHammingMixed]]'s contract): every histogram bin must
    * come out identical whether the payload was BMP or PNG. */
  def pixelHistRealMixed(spark: SparkSession, dir: String): DataFrame =
    pixelHistRealOf(imageBlobsMixedLossless(spark, dir))

  /** [[pixelHistReal]] over ANY blob source. */
  private[graft] def pixelHistRealOf(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(pixelHistBatch))
      .select(posexplode(col("bins")))
      .select(col("pos").cast("int").as("bin"), col("col").as("cnt"))
      .groupBy("bin")
      .agg(sum("cnt").as("n_px"))
      .orderBy("bin")
  }

  /** REAL perceptual hash — the decode → resample → fingerprint chain
    * every image-dedup pipeline runs, on genuine pixels: each decoded
    * BMP is thumbnailed to a fixed 8×8 grid by nearest-neighbor
    * (`src = thumb·dim div 8` — the integer resample that consumes
    * [[resizeSpecs]]-style planning), then dHash'd: bit (x, y) = 1
    * iff thumb(x+1, y) > thumb(x, y), 7×8 = 56 bits (BIGINT-safe).
    * Per-image state is ONE long however large the payload; the
    * whole chain is map-side batched decode, no shuffle. */
  private[graft] def dhashBatch(batch: Seq[MediaBlob]): Seq[(Long, Long)] =
    batch.map { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload))
      require(img != null, s"mm_dhash: undecodable image, doc ${b.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      def g(tx: Int, ty: Int): Int =
        img.getRGB(tx * w / 8, ty * h / 8) & 0xff
      var hash = 0L
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 7) {
          if (g(x + 1, y) > g(x, y)) hash |= 1L << (y * 7 + x)
          x += 1
        }
        y += 1
      }
      (b.doc_id, hash)
    }

  /** The dHash fingerprint table over the really-decoded corpus —
    * joins into [[nearDupMedia]]-style grouping downstream (equal
    * hashes ⇒ near-identical luminance structure). Oracle regenerates
    * each of the 56 comparison bits from the planted gradient through
    * the SAME integer thumbnail mapping. */
  def mediaDhash(spark: SparkSession, dir: String): DataFrame =
    mediaDhashOf(imageBlobs(spark, dir))

  /** [[mediaDhash]] over ANY blob source. */
  private[graft] def mediaDhashOf(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(dhashBatch))
      .toDF("doc_id", "dhash")
      .sortWithinPartitions("doc_id")
  }

  /** Near-duplicate detection over the REAL perceptual hashes — the
    * [[nearDupMedia]] grouping shape applied to [[mediaDhash]]: equal
    * 56-bit fingerprints (near-identical luminance structure in the
    * genuinely decoded thumbnails) fall out of ONE groupBy; no
    * pairwise compare, payloads never shuffle. */
  def nearDupDhash(spark: SparkSession, dir: String): DataFrame =
    mediaDhash(spark, dir)
      .groupBy(col("dhash"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") > 1)
      .sortWithinPartitions("dhash")

  /** Generated DuckDB oracle for [[nearDupDhash]] — the dHash oracle
    * regrouped. */
  def nearDupDhashOracleSql: String =
    s"""WITH h AS (${mediaDhashOracleSql.replace("ORDER BY doc_id", "")})
       SELECT dhash, count(*) AS n_docs, min(doc_id) AS keep_id
       FROM h GROUP BY dhash HAVING count(*) > 1 ORDER BY dhash"""

  /** REAL aHash — the MEAN-THRESHOLD perceptual fingerprint that
    * completes the trio ([[dhashBatch]] reads local gradients,
    * [[phashBatch]] global frequencies; aHash reads absolute
    * brightness — the cheapest and the one most robust to small
    * translations): bit (x, y) = 1 iff thumb(x, y) > mean(thumb),
    * with the integer floor mean (`Σ div 64`) so no float enters.
    * 63 bits — position (7,7) is dropped to stay BIGINT-safe (the
    * 56-bit dHash discipline; bit 63 would be the long's sign).
    * Same zero-exchange batched decode chain. */
  private[graft] def ahashBatch(batch: Seq[MediaBlob]): Seq[(Long, Long)] =
    batch.map { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload))
      require(img != null, s"mm_ahash: undecodable image, doc ${b.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val t = Array.tabulate(8, 8)((y, x) => img.getRGB(x * w / 8, y * h / 8) & 0xff)
      var s = 0L
      var y = 0
      while (y < 8) { var x = 0; while (x < 8) { s += t(y)(x); x += 1 }; y += 1 }
      val mean = s / 64
      var hash = 0L
      y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val bit = y * 8 + x
          if (bit < 63 && t(y)(x) > mean) hash |= 1L << bit
          x += 1
        }
        y += 1
      }
      (b.doc_id, hash)
    }

  /** The aHash fingerprint table over the really-decoded corpus. */
  def mediaAhash(spark: SparkSession, dir: String): DataFrame =
    mediaAhashOf(imageBlobs(spark, dir))

  /** [[mediaAhash]] over ANY blob source. */
  private[graft] def mediaAhashOf(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(ahashBatch))
      .toDF("doc_id", "ahash")
      .sortWithinPartitions("doc_id")
  }

  /** Generated DuckDB oracle for [[mediaAhash]] — every thumbnail
    * pixel regenerated from the planted gradient through the same
    * integer resample, the same floor mean, the same 63-bit pack. */
  val mediaAhashOracleSql: String =
    """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
              8 + length(text) % 16 AS h FROM documents),
       t AS (SELECT doc_id, x, y,
               ((x * w // 8) * 7 + (y * h // 8) * 13 + doc_id * 31) % 256 AS v
             FROM d, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
       m AS (SELECT doc_id, CAST(sum(v) AS BIGINT) // 64 AS mean
             FROM t GROUP BY 1),
       b AS (SELECT t.doc_id,
               CASE WHEN y * 8 + x < 63 AND v > m.mean
                    THEN (CAST(1 AS BIGINT) << (y * 8 + x)) ELSE 0 END AS bit
             FROM t JOIN m ON m.doc_id = t.doc_id)
       SELECT doc_id, CAST(sum(bit) AS BIGINT) AS ahash
       FROM b GROUP BY doc_id ORDER BY doc_id"""

  /** Fixed-point 8×8 DCT-II basis, scale 2¹⁶, orthonormal s(u)
    * factors folded in: `B(u)(x) = round(s(u)·cos((2x+1)uπ/16)·2¹⁶)`.
    * Generated ONCE here and embedded as literals in the oracle, so
    * the two engines share the identical integer matrix by
    * construction (the LSH-hyperplane discipline). */
  private[graft] val DctB: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val s = if (u == 0) math.sqrt(1.0 / 8) else math.sqrt(2.0 / 8)
    math.round(s * math.cos((2 * x + 1) * u * math.Pi / 16) * 65536.0)
  }

  /** REAL pHash — the DCT perceptual fingerprint ([[dhashBatch]]'s
    * frequency-domain sibling, the other hash every image-dedup
    * pipeline ships): decode → 8×8 nearest-neighbor thumbnail →
    * integer 2D DCT-II ([[DctB]] fixed point — every coefficient is
    * an exact BIGINT sum of g·B·B products, ≤ 2⁴⁴) → one bit per
    * non-DC coefficient vs the lower MEDIAN of the 63 (selection by
    * the (value, u, v) total order — deterministic under ties).
    * 63 bits, one long per image, map-side batched decode. */
  private[graft] def phashBatch(batch: Seq[MediaBlob]): Seq[(Long, Long)] =
    batch.map { b =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b.payload))
      require(img != null, s"mm_phash: undecodable image, doc ${b.doc_id}")
      val (w, h) = (img.getWidth, img.getHeight)
      val g = Array.tabulate(8, 8)((x, y) =>
        (img.getRGB(x * w / 8, y * h / 8) & 0xff).toLong)
      val coefs = for {
        u <- 0 until 8; v <- 0 until 8 if !(u == 0 && v == 0)
      } yield {
        var c = 0L
        var x = 0
        while (x < 8) {
          var y = 0
          while (y < 8) {
            c += g(x)(y) * DctB(u)(x) * DctB(v)(y)
            y += 1
          }
          x += 1
        }
        (u, v, c)
      }
      val med = coefs.sortBy(t => (t._3, t._1, t._2)).apply(31)._3
      var hv = 0L
      coefs.foreach { case (u, v, c) =>
        if (c > med) hv |= 1L << (u * 8 + v - 1)
      }
      (b.doc_id, hv)
    }

  /** The pHash fingerprint table over the really-decoded corpus —
    * [[mediaDhash]]'s DCT sibling; the oracle regenerates every
    * planted pixel AND replays the integer DCT with the same
    * embedded basis. */
  def mediaPhash(spark: SparkSession, dir: String): DataFrame =
    mediaPhashOf(imageBlobs(spark, dir))

  /** [[mediaPhash]] over ANY blob source. */
  private[graft] def mediaPhashOf(blobs: Dataset[MediaBlob]): DataFrame = {
    import blobs.sparkSession.implicits._
    blobs
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(phashBatch))
      .toDF("doc_id", "phash")
      .sortWithinPartitions("doc_id")
  }

  /** Generated DuckDB oracle for [[mediaPhash]]: planted-geometry
    * thumbnail pixels × the embedded basis literals, lower-median
    * selection by (value, u, v), bit-packed. */
  def mediaPhashOracleSql: String = {
    val basis = (for (u <- 0 until 8; x <- 0 until 8)
      yield s"($u, $x, ${DctB(u)(x)})").mkString(", ")
    s"""WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
              8 + length(text) % 16 AS h FROM documents),
       g AS (SELECT doc_id,
               x, y,
               (((x * w // 8) * 7 + (y * h // 8) * 13
                 + doc_id * 31) % 256) AS px
             FROM d, generate_series(0, 7) gx(x), generate_series(0, 7) gy(y)),
       bq AS (SELECT * FROM (VALUES $basis) AS t(u, x, bv)),
       coef AS (SELECT g.doc_id, bu.u, bv.u AS v,
                       CAST(sum(g.px * bu.bv * bv.bv) AS BIGINT) AS c
                FROM g JOIN bq bu ON bu.x = g.x
                       JOIN bq bv ON bv.x = g.y
                GROUP BY 1, 2, 3),
       lf AS (SELECT doc_id, u, v, c FROM coef WHERE NOT (u = 0 AND v = 0)),
       med AS (SELECT doc_id, c AS mval FROM (
                 SELECT doc_id, c,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY c, u, v) AS rn
                 FROM lf) WHERE rn = 32)
       SELECT lf.doc_id,
              CAST(sum(CASE WHEN lf.c > med.mval
                       THEN (CAST(1 AS BIGINT) << (lf.u * 8 + lf.v - 1))
                       ELSE 0 END) AS BIGINT) AS phash
       FROM lf JOIN med ON med.doc_id = lf.doc_id
       GROUP BY lf.doc_id ORDER BY lf.doc_id"""
  }

  /** Generated DuckDB oracle for [[nearDupPhash]] — the pHash oracle
    * chunk-bucketed and xor-verified over its 63 bits. */
  def nearDupPhashOracleSql: String = {
    val n = 4 // maxHamming 3 + 1
    val chunkArms = (0 until n).map { c =>
      val lo = c * 63 / n
      val width = (c + 1) * 63 / n - lo
      s"'$c#' || CAST(((phash >> $lo) & ${(1L << width) - 1}) AS VARCHAR)"
    }.mkString(", ")
    s"""WITH h AS (${mediaPhashOracleSql.replace("ORDER BY lf.doc_id", "")}),
       chunks AS (SELECT doc_id, phash, unnest([$chunkArms]) AS ck FROM h),
       pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                        bit_count(xor(a.phash, b.phash)) AS hamming
                 FROM chunks a JOIN chunks b
                   ON a.ck = b.ck AND a.doc_id < b.doc_id)
       SELECT d1, d2, hamming FROM pairs
       WHERE hamming <= 3 ORDER BY d1, d2"""
  }

  /** The mean-threshold member: [[mediaAhash]] fingerprints through
    * the same chunk-bucket probe (63 hash bits) — completing the
    * Hamming-tolerant trio (gradient dHash, frequency pHash, mean
    * aHash fail on DIFFERENT perturbations, so production pipelines
    * run all three and union the verdicts). */
  def nearDupAhash(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    nearDupHammingOf(
      mediaAhash(spark, dir).select(col("doc_id"),
        col("ahash").as("dhash")), maxHamming, bits = 63)

  /** Generated DuckDB oracle for [[nearDupAhash]] — the aHash oracle
    * chunk-bucketed and xor-verified. */
  def nearDupAhashOracleSql: String = {
    val n = 4 // maxHamming 3 + 1
    val chunkArms = (0 until n).map { c =>
      val lo = c * 63 / n
      val width = (c + 1) * 63 / n - lo
      s"'$c#' || CAST(((ahash >> $lo) & ${(1L << width) - 1}) AS VARCHAR)"
    }.mkString(", ")
    s"""WITH h AS (${mediaAhashOracleSql.replace("ORDER BY doc_id", "")}),
       chunks AS (SELECT doc_id, ahash, unnest([$chunkArms]) AS ck FROM h),
       pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                        bit_count(xor(a.ahash, b.ahash)) AS hamming
                 FROM chunks a JOIN chunks b
                   ON a.ck = b.ck AND a.doc_id < b.doc_id)
       SELECT d1, d2, hamming FROM pairs
       WHERE hamming <= 3 ORDER BY d1, d2"""
  }

  /** HAMMING-TOLERANT perceptual near-dup — [[nearDupDhash]] catches
    * only bit-exact fingerprints; real near-dups (recompressed,
    * slightly cropped, brightness-jittered copies) land a few bits
    * away. Pigeonhole chunk bucketing, the [[Dedup.simhashDf]]
    * discipline applied to the 56-bit dHash: split the hash into
    * `maxHamming + 1` disjoint chunks — two hashes within Hamming ≤
    * maxHamming must agree on at least one chunk — bucket-join on
    * chunk equality, then verify candidates with one codegen'd
    * `bit_count(xor)`. No pairwise compare, payloads never shuffle;
    * candidate volume is bounded by bucket occupancy (14-bit chunks),
    * exactly the LSH-style bound that survives a 100× corpus. */
  def nearDupHamming(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    nearDupHammingOf(
      mediaDhash(spark, dir).select(col("doc_id"), col("dhash")), maxHamming)

  /** [[nearDupHamming]] over the FORMAT-MIXED lossless corpus (even
    * doc_ids BMP, odd PNG): ImageIO sniffs each payload, and PNG
    * decodes to byte-identical pixels, so this query is gated against
    * the SAME planted-pixel oracle as the all-BMP chain — the
    * driver's hash gate itself (not just MultimodalSpec's parity pin)
    * proves the PNG decode path end to end. A lossy format in the mix
    * (JPEG) would hash-fail here by design. */
  def nearDupHammingMixed(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    nearDupHammingOf(
      mediaDhashOf(imageBlobsMixedLossless(spark, dir))
        .select(col("doc_id"), col("dhash")), maxHamming)

  /** The DCT twin: [[mediaPhash]] fingerprints through the same
    * chunk-bucket probe (63 hash bits). A dHash-tolerant AND a
    * pHash-tolerant pass together are the standard production pair —
    * gradient structure and frequency structure fail differently. */
  def nearDupPhash(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame =
    nearDupHammingOf(
      mediaPhash(spark, dir).select(col("doc_id"),
        col("phash").as("dhash")), maxHamming, bits = 63)

  /** The chunk-bucket probe over ANY (doc_id, dhash) table
    * (spec surface; [[nearDupHamming]]/[[nearDupPhash]] derive the
    * hashes inline; `bits` = fingerprint width the chunks cover). */
  private[graft] def nearDupHammingOf(hashes: DataFrame,
      maxHamming: Int, bits: Int = 56): DataFrame = {
    val n = maxHamming + 1
    val chunked = hashes.select(col("doc_id"), col("dhash"),
      explode(dhashChunks(col("dhash"), n, bits)).as("ck"))
    chunked.as("a")
      .join(chunked.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        graft.functions.Shingles.hamming(col("a.dhash"), col("b.dhash"))
          .as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .sortWithinPartitions("d1", "d2")
  }

  /** The `n` disjoint contiguous chunks of a `bits`-wide hash, as
    * prefixed string keys (chunk c covers bits [c·bits/n, (c+1)·bits/n)
    * — together they cover all bits, the pigeonhole premise). */
  private def dhashChunks(h: Column, n: Int, bits: Int = 56): Column =
    array((0 until n).map { c =>
      val lo = c * bits / n
      val width = (c + 1) * bits / n - lo
      concat(lit(s"$c#"),
        shiftright(h, lo).bitwiseAND(lit((1L << width) - 1)).cast("string"))
    }: _*)

  /** Generated DuckDB oracle for [[nearDupHamming]] — the dHash
    * oracle chunk-bucketed and xor-verified (the bucket rule IS the
    * operator's semantics, so the oracle replays it). */
  def nearDupHammingOracleSql: String = {
    val n = 4 // maxHamming 3 + 1
    val chunkArms = (0 until n).map { c =>
      val lo = c * 56 / n
      val width = (c + 1) * 56 / n - lo
      s"'$c#' || CAST(((dhash >> $lo) & ${(1L << width) - 1}) AS VARCHAR)"
    }.mkString(", ")
    s"""WITH h AS (${mediaDhashOracleSql.replace("ORDER BY doc_id", "")}),
       chunks AS (SELECT doc_id, dhash, unnest([$chunkArms]) AS ck FROM h),
       pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2,
                        bit_count(xor(a.dhash, b.dhash)) AS hamming
                 FROM chunks a JOIN chunks b
                   ON a.ck = b.ck AND a.doc_id < b.doc_id)
       SELECT d1, d2, hamming FROM pairs
       WHERE hamming <= 3 ORDER BY d1, d2"""
  }

  /** Generated DuckDB oracle for [[mediaDhash]]. */
  def mediaDhashOracleSql: String =
    """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
              8 + length(text) % 16 AS h FROM documents),
       b AS (SELECT doc_id,
               CASE WHEN (((x + 1) * w // 8) * 7 + (y * h // 8) * 13
                          + doc_id * 31) % 256
                       > ((x * w // 8) * 7 + (y * h // 8) * 13
                          + doc_id * 31) % 256
                    THEN (CAST(1 AS BIGINT) << (y * 7 + x)) ELSE 0 END AS bit
             FROM d, generate_series(0, 6) gx(x), generate_series(0, 7) gy(y))
       SELECT doc_id, CAST(sum(bit) AS BIGINT) AS dhash
       FROM b GROUP BY doc_id ORDER BY doc_id"""

  /** Generated DuckDB oracle for [[decodeMetaReal]]: the planted
    * geometry + the BMP size formula. */
  def decodeMetaRealOracleSql: String =
    """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
              8 + length(text) % 16 AS h FROM documents)
       SELECT doc_id % 4 AS shard, count(*) AS n,
              round(avg(w), 6) AS avg_w, round(avg(h), 6) AS avg_h,
              CAST(sum(54 + h * ((3 * w + 3) // 4 * 4)) AS BIGINT) AS total_bytes
       FROM d GROUP BY shard ORDER BY shard"""

  /** Generated DuckDB oracle for [[pixelHistReal]]: regenerate every
    * planted pixel (bounded series cross join, filtered to each
    * image's true extent) and histogram it. */
  def pixelHistRealOracleSql: String =
    """WITH d AS (SELECT doc_id, 8 + doc_id % 24 AS w,
              8 + length(text) % 16 AS h FROM documents),
       p AS (SELECT ((x * 7 + y * 13 + doc_id * 31) % 256) // 32 AS bin
             FROM d, generate_series(0, 30) gx(x), generate_series(0, 22) gy(y)
             WHERE x < w AND y < h)
       SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n_px
       FROM p GROUP BY bin ORDER BY bin"""

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
