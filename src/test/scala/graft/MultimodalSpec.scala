package graft

import graft.operators.Multimodal

/** The multimodal plumbing: real codecs over planted corpora —
  * container walk, batched decode, executed resample, fingerprints. */
class MultimodalSpec extends SparkSpecBase {

  test("video strips: container walk splits on REAL BMP size fields; corruption fails loudly") {
    // a hand-built 2-frame strip round-trips through splitFrames
    val f0 = Multimodal.bmpBytes(3, 2, (x, y) => 10 * x + y)
    val f1 = Multimodal.bmpBytes(3, 2, (x, y) => 20 * x + y)
    val frames = Multimodal.splitFrames(f0 ++ f1)
    assert(frames.length == 2)
    assert(frames(0).toSeq == f0.toSeq && frames(1).toSeq == f1.toSeq)
    // a desynchronized container (header magic broken) is rejected
    val corrupt = (f0 ++ f1).clone()
    corrupt(f0.length) = 'X'.toByte
    intercept[IllegalArgumentException](Multimodal.splitFrames(corrupt))
    // a truncated final frame is rejected (size field overruns)
    intercept[IllegalArgumentException](
      Multimodal.splitFrames((f0 ++ f1).dropRight(4)))
    // the planted corpus is real strips: every doc splits into its
    // planted frame count
    Multimodal.videoBlobs(spark, Sf).collect().take(20).foreach { b =>
      assert(Multimodal.splitFrames(b.payload).length ==
        Multimodal.plantedFrames(b.doc_id), s"doc ${b.doc_id}")
    }
  }

  test("frame sampling: <= k uniform-stride frames, means off really-decoded pixels") {
    val rows = Multimodal.frameSampleReal(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_._1)
    assert(perDoc.size ==
      graft.core.Tables(spark, Sf).documents.count())
    perDoc.foreach { case (id, fs) =>
      assert(fs.length <= Multimodal.FrameSampleK,
        s"doc $id sampled ${fs.length} frames")
      val n = Multimodal.plantedFrames(id)
      val stride = (n + Multimodal.FrameSampleK - 1) / Multimodal.FrameSampleK
      assert(fs.map(_._2).sorted.toSeq == (0 until n by stride).toSeq,
        s"doc $id stride rule")
    }
    // spot-check one doc end to end against a direct decode
    val b = Multimodal.videoBlobs(spark, Sf).collect().head
    val direct = Multimodal.frameMeanBatch(Seq(b), Multimodal.FrameSampleK)
    assert(rows.filter(_._1 == b.doc_id).sortBy(_._2).toSeq ==
      direct.sortBy(_._2).toSeq)
  }

  test("resize: plan fits 224 with integer aspect; checksum proves the resample EXECUTED") {
    val rows = Multimodal.resizeReal(spark, Sf).collect()
    assert(rows.length == graft.core.Tables(spark, Sf).documents.count())
    rows.foreach { r =>
      val (w, h) = (r.getInt(1).toLong, r.getInt(2).toLong)
      val (nw, nh) = (r.getInt(3).toLong, r.getInt(4).toLong)
      assert(math.max(nw, nh) == 224, s"$w x $h -> $nw x $nh")
      assert(nw > 0 && nh > 0)
      if (w >= h) assert(nh == h * 224 / w) else assert(nw == w * 224 / h)
    }
    // checksum equals a direct nearest-neighbor resample of the
    // planted gradient (thumbnail source map src = dst*dim div new)
    val byId = rows.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getLong(5))).toMap
    Multimodal.imageBlobs(spark, Sf).collect().take(10).foreach { b =>
      val (w, h, nw, nh, ck) = byId(b.doc_id)
      var want = 0L
      for (ty <- 0 until nh; tx <- 0 until nw)
        want += Multimodal.plantedGray(b.doc_id, tx * w / nw, ty * h / nh)
      assert(ck == want, s"doc ${b.doc_id} checksum")
    }
  }

  test("pixel moments: exact integer count/sum/sumsq over decoded pixels") {
    val rows = Multimodal.pixelMomentsReal(spark, Sf).collect()
    assert(rows.length == graft.core.Tables(spark, Sf).documents.count())
    rows.foreach { r =>
      val (n, s, s2, mm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(n > 0 && s >= 0 && s2 >= s, s"doc ${r.getLong(0)}")
      assert(mm == s * 1000L / n, "floor milli mean")
      // variance numerator is non-negative (Cauchy-Schwarz on ints)
      assert(n * s2 - s * s >= 0)
    }
  }

  test("mixed-format meta stats: real headers per format, pixel totals match geometry") {
    val rows = Multimodal.metaStatsMixed(spark, Sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("bmp", "png"))
    val total = rows.map(_.getLong(1)).sum
    assert(total == graft.core.Tables(spark, Sf).documents.count())
    // per-format pixel totals recompute from the planted geometry
    val docs = graft.core.Tables(spark, Sf).documents
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).as("tlen"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val wantPx = docs.groupBy { case (id, _) =>
      if (id % 2 == 0) "bmp" else "png" }
      .view.mapValues(_.map { case (id, tl) =>
        Multimodal.plantedW(id).toLong * Multimodal.plantedH(tl) }.sum).toMap
    rows.foreach { r =>
      assert(r.getLong(4) == wantPx(r.getString(0)), s"${r.getString(0)} px")
    }
  }

  test("histSig: quantized per-mille shares, absent bins skipped; near-dup collides") {
    // 4 of bin0 + 4 of bin6: shares 500/500 -> buckets 20-20
    assert(Multimodal.histSig(Array(4L, 0, 0, 0, 0, 0, 4L, 0), 25) == "20-20")
    // slightly perturbed distribution (3:5) collides within the bucket? 375//25=15, 625//25=25
    assert(Multimodal.histSig(Array(3L, 0, 0, 0, 0, 0, 5L, 0), 25) == "15-25")
    // 7:9 ~ 437/562 -> 17-22 vs 8:8 -> 20-20: beyond bucket width, separates
    assert(Multimodal.histSig(Array(8L, 0, 0, 0, 0, 0, 8L, 0), 25) ==
      Multimodal.histSig(Array(400L, 0, 0, 0, 0, 0, 400L, 0), 25))
  }

  test("REAL decode: a known BMP fixture decodes to known pixels") {
    // 3x2 gradient, gray(x, y) = 10x + 100y — hand-checkable
    val bytes = Multimodal.bmpBytes(3, 2, (x, y) => 10 * x + 100 * y)
    // encoder math: 54-byte header + 2 rows of (3*3 -> padded 12) bytes
    assert(bytes.length == 54 + 2 * 12)
    assert(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "JRE ImageIO must decode the generated BMP")
    assert(img.getWidth == 3 && img.getHeight == 2)
    // top-origin pixel grid round-trips exactly (bottom-up file order
    // inverted back by the decoder); gray rides all three channels
    for (y <- 0 until 2; x <- 0 until 3) {
      val px = img.getRGB(x, y)
      val expected = 10 * x + 100 * y
      assert((px & 0xff) == expected, s"($x,$y) blue")
      assert(((px >> 8) & 0xff) == expected, s"($x,$y) green")
      assert(((px >> 16) & 0xff) == expected, s"($x,$y) red")
    }
  }

  test("REAL decode: batched ImageIO metadata matches the planted geometry") {
    val blobs = Multimodal.imageBlobs(spark, Sf).collect().take(20)
    val metas = Multimodal.decodeImageBatch(blobs.toSeq)
    metas.zip(blobs).foreach { case (m, b) =>
      assert(m.width == Multimodal.plantedW(b.doc_id),
        s"doc ${b.doc_id} width")
      assert(m.size_bytes == b.payload.length.toLong)
      // BMP size formula doubles as a stride check
      val rowSize = (3 * m.width + 3) / 4 * 4
      assert(m.size_bytes == 54L + rowSize.toLong * m.height)
    }
    // pixel histogram over real decoded pixels ≡ the planted gradient
    val hists = Multimodal.pixelHistBatch(blobs.toSeq)
    hists.zip(blobs).foreach { case (h, b) =>
      val w = Multimodal.plantedW(b.doc_id)
      val hh = (h.bins.sum / w).toInt
      val expected = new Array[Long](8)
      for (y <- 0 until hh; x <- 0 until w)
        expected(Multimodal.plantedGray(b.doc_id, x, y) / 32) += 1L
      assert(h.bins.toSeq == expected.toSeq, s"doc ${b.doc_id} histogram")
    }
  }

  test("REAL dHash: monotonic gradients saturate, inversions zero, thumbnail maps 2:1") {
    def hashOf(w: Int, h: Int, pix: (Int, Int) => Int): Long =
      Multimodal.dhashBatch(Seq(Multimodal.MediaBlob(0L, "image",
        Multimodal.bmpBytes(w, h, pix)))).head._2
    // 8x8 identity thumbnail, gray strictly increasing in x -> every
    // comparison bit set: 2^56 - 1
    assert(hashOf(8, 8, (x, _) => x * 10) == (1L << 56) - 1)
    // strictly decreasing -> no bit set
    assert(hashOf(8, 8, (x, _) => 255 - x * 10) == 0L)
    // 16x16 source: nearest-neighbor picks src column 2x — still
    // strictly increasing in thumb x, so saturated again
    assert(hashOf(16, 16, (x, _) => x * 5) == (1L << 56) - 1)
    // constant image: strict > never fires
    assert(hashOf(8, 8, (_, _) => 128) == 0L)
  }

  test("mm_dedup groups only multi-member signatures over real pixel histograms") {
    val got = Multimodal.nearDupMedia(spark, Sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) > 1, "every reported group must have >1 member")
    }
    // the signature really derives from decoded pixels: every member
    // of a spot-checked group shares the planted-histogram signature
    val blobs = Multimodal.imageBlobs(spark, Sf).collect().take(30).toSeq
    val sigs = Multimodal.pixelHistBatch(blobs)
      .map(h => h.doc_id -> Multimodal.histSig(h.bins, 25)).toMap
    sigs.groupBy(_._2).values.filter(_.size > 1).take(3).foreach { g =>
      val ids = g.keys.toSeq
      assert(got.exists(r => r.getLong(2) <= ids.min),
        s"collision group $ids must be reported")
    }
  }

  test("REAL pHash: constant image hashes 0, thumbnail-equal resolutions agree, inversion differs") {
    def hashOf(w: Int, h: Int, pix: (Int, Int) => Int): Long =
      Multimodal.phashBatch(Seq(Multimodal.MediaBlob(0L, "image",
        Multimodal.bmpBytes(w, h, pix)))).head._2
    // constant image: every non-DC DCT coefficient is 0, median 0,
    // strict > never fires
    assert(hashOf(8, 8, (_, _) => 128) == 0L)
    // nearest-neighbor 2:1 map: a 16x16 image whose pixels depend only
    // on (x div 2, y div 2) thumbnails identically to the 8x8 original
    val f = (x: Int, y: Int) => (x * 37 + y * 11) % 256
    assert(hashOf(16, 16, (x, y) => f(x / 2, y / 2)) == hashOf(8, 8, f))
    // photometric inversion flips every non-DC coefficient's sign —
    // a DIFFERENT fingerprint (and basis sanity: both are nonzero)
    val a = hashOf(8, 8, f)
    val b = hashOf(8, 8, (x, y) => 255 - f(x, y))
    assert(a != 0L && b != 0L && a != b)
    // the DCT basis is the orthonormal one: row 0 is constant, every
    // other row sums to ~0 in fixed point
    assert(Multimodal.DctB(0).distinct.length == 1)
    (1 until 8).foreach { u =>
      assert(math.abs(Multimodal.DctB(u).sum) <= 4,
        s"basis row $u must be zero-mean: ${Multimodal.DctB(u).toSeq}")
    }
  }

  test("mm_dedup_hamming: planted ±1/±3-bit pairs found, ±4-bit pair excluded") {
    import spark.implicits._
    val base = 0x00A5C3E1B2D4F6L // arbitrary 56-bit fingerprint
    val hashes = Seq(
      1L -> base,
      2L -> (base ^ 1L),                                  // hamming 1
      3L -> (base ^ 7L),                                  // hamming 3, all in chunk 0
      4L -> (base ^ ((1L << 0) | (1L << 14) | (1L << 28) | (1L << 42))),
      // ^ hamming 4, one flip PER chunk — shares no chunk AND exceeds
      //   the threshold; must be absent on both grounds
      5L -> (base ^ ((1L << 1) | (1L << 15))),            // hamming 2, chunks 0+1
    ).toDF("doc_id", "dhash")
    val got = Multimodal.nearDupHammingOf(hashes, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got.contains((1L, 2L)) && got((1L, 2L)) == 1, s"±1-bit pair: $got")
    assert(got.contains((1L, 3L)) && got((1L, 3L)) == 3,
      s"3 flips inside ONE chunk still share the other chunks: $got")
    assert(got.contains((1L, 5L)) && got((1L, 5L)) == 2, s"±2-bit pair: $got")
    assert(!got.contains((1L, 4L)),
      s"the ±4-bit pair (1,4) must be excluded: $got")
    // (2,4) IS a pair: both flip bit 0, leaving hamming 3 between them
    assert(got.get((2L, 4L)).contains(3), s"hamming(2,4) = 3: $got")
    // transitivity of the planted family: 2,3,5 also pair among
    // themselves where their mutual distance <= 3
    assert(got.contains((2L, 3L)), s"hamming(2,3) = 2: $got")
  }

  test("mm_dedup_phash: 63-bit chunking finds top-bit jitter; corpus pairs verified") {
    import spark.implicits._
    // a flip in the HIGHEST bit (62) must still bucket — the chunk
    // map covers all 63 bits, not 56
    val base = 0x3FA5C3E1B2D4F6L
    val hashes = Seq(1L -> base, 2L -> (base ^ (1L << 62)))
      .toDF("doc_id", "dhash")
    val got = Multimodal.nearDupHammingOf(hashes, maxHamming = 3, bits = 63)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 2L, 1)), got.toSeq.toString)
    // real corpus: all reported distances within threshold; exact
    // pHash dups appear at hamming 0
    val pairs = Multimodal.nearDupPhash(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty && pairs.forall(p => p._3 >= 0 && p._3 <= 3))
    val dupGroups = Multimodal.mediaPhash(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).values.filter(_.length > 1)
    val zero = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    dupGroups.foreach { g =>
      g.map(_._1).sorted.combinations(2).foreach { case Array(a, b) =>
        assert(zero.contains((a, b)), s"exact pHash dup ($a,$b) missing")
      }
    }
  }

  test("mm_dedup_hamming over the real corpus: supersets exact dedup, verified distances") {
    val pairs = Multimodal.nearDupHamming(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (d1, d2, hm) =>
      assert(d1 < d2 && hm >= 0 && hm <= 3, s"($d1,$d2,$hm)")
    }
    // every exact-dup group member pair (hamming 0) must be present
    val exact = Multimodal.nearDupDhash(spark, Sf).collect()
    assert(exact.nonEmpty)
    val zeroPairs = pairs.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    val hashes = Multimodal.mediaDhash(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    hashes.groupBy(_._2).values.filter(_.length > 1).foreach { g =>
      val ids = g.map(_._1).sorted
      ids.combinations(2).foreach { case Array(a, b) =>
        assert(zeroPairs.contains((a, b)),
          s"exact-dup pair ($a,$b) missing from the hamming probe")
      }
    }
  }

  /** JPEG/PNG tier: the decode chain is format-agnostic (ImageIO
    * sniffs each payload), and correctness is pinned the way the BMP
    * chain pinned parity — the SAME planted pixels re-encoded as
    * lossless PNG must produce row-identical fingerprints to the
    * DuckDB-gated BMP chain, so the gate transitively covers the PNG
    * path. JPEG is lossy by design: only geometry is
    * format-invariant, and that's what its assertion checks. */
  test("PNG re-encode: hist/dHash/aHash/pHash rows identical to the gated BMP chain") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val png = Multimodal.imageBlobsAs(spark, Sf, _ => "png")
    val bmp = Multimodal.imageBlobs(spark, Sf)
    assert(rows(Multimodal.pixelHistRealOf(png)) ==
      rows(Multimodal.pixelHistRealOf(bmp)))
    assert(rows(Multimodal.mediaDhashOf(png)) ==
      rows(Multimodal.mediaDhashOf(bmp)))
    assert(rows(Multimodal.mediaAhashOf(png)) ==
      rows(Multimodal.mediaAhashOf(bmp)))
    assert(rows(Multimodal.mediaPhashOf(png)) ==
      rows(Multimodal.mediaPhashOf(bmp)))
  }

  test("mixed BMP/PNG corpus: the mm query surfaces produce the all-BMP rows") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val mixed = Multimodal.imageBlobsMixedLossless(spark, Sf)
    // the downstream query shapes (fingerprint → near-dup) run
    // unchanged over the mixed-format corpus and match the gated
    // all-BMP outputs row-for-row
    val gated = Multimodal.nearDupHamming(spark, Sf)
    val viaMixed = Multimodal.nearDupHammingOf(
      Multimodal.mediaDhashOf(mixed), maxHamming = 3)
    assert(rows(viaMixed) == rows(gated))
    val gatedP = Multimodal.nearDupPhash(spark, Sf)
    val viaMixedP = Multimodal.nearDupHammingOf(
      Multimodal.mediaPhashOf(mixed)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("phash").as("dhash")),
      maxHamming = 3, bits = 63)
    assert(rows(viaMixedP) == rows(gatedP))
  }

  test("JPEG re-encode: geometry decodes format-invariant; pixels are lossy by design") {
    val jpg = Multimodal.decodeMetaRealOf(
        Multimodal.imageBlobsAs(spark, Sf, _ => "jpeg"))
      .select("shard", "n", "avg_w", "avg_h").collect()
      .map(_.toSeq).toSeq
    val bmp = Multimodal.decodeMetaReal(spark, Sf)
      .select("shard", "n", "avg_w", "avg_h").collect()
      .map(_.toSeq).toSeq
    assert(jpg == bmp) // size_bytes differs (codec), geometry cannot
  }
}
