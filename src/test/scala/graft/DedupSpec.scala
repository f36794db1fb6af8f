package graft

import graft.operators.Dedup

/** Approximate dedup (minhash LSH, simhash) against exact Jaccard
  * ground truth — on a crafted corpus with planted near-dups and on
  * the synthetic documents table (which also contains planted dups). */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = {
    val base = "the quick brown fox jumps over the lazy dog near the river bank " +
      "while the sun sets slowly behind the tall green hills in the distance"
    Seq(
      (0L, base),
      (1L, base.replace("quick", "swift")),                       // near-dup of 0
      (2L, base),                                                 // exact dup of 0
      (3L, "completely different content about spark catalyst optimizer rules " +
        "and whole stage code generation for analytical query plans today"),
      (4L, "yet another unrelated document discussing minhash banding theory " +
        "locality sensitive hashing and jaccard similarity estimation methods"),
    ).toDF("doc_id", "text")
  }

  test("prefix filter ≡ exact all-pairs, including a pair at exactly τ") {
    // planted boundary: 5-token docs → 3 word-3-grams each; A/B share
    // 2 of 3 grams → J = 2/(3+3-2) = 0.5 — ON the τ=0.5 boundary,
    // must be kept; C shares 1 gram with A → J = 0.2, must be pruned
    val docs = Seq(
      (0L, "a b c d e"),
      (1L, "a b c d f"),   // grams: abc,bcd,cdf — inter 2 with 0
      (2L, "z y c d e"),   // grams: zyc,ycd,cde — inter 1 with 0
      (3L, "a b c d e"),   // exact dup of 0 — J = 1
      (4L, "totally different words here now"),
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val pf = rows(Dedup.prefixJaccardDf(docs, tau = 0.5))
    val exact = rows(Dedup.ngramJaccardDf(docs, tau = 0.5))
    assert(pf == exact, s"prefix filter diverged:\n pf=$pf\n ex=$exact")
    assert(pf.contains((0L, 1L, 2L, 0.5)), "boundary pair must survive")
    assert(pf.exists(p => p._1 == 0L && p._2 == 3L && p._4 == 1.0))
    assert(!pf.exists(p => p._1 == 2L || p._2 == 2L), "sub-τ pair pruned")
  }

  test("minhash LSH finds planted near-dups and exact dups") {
    val pairs = Dedup.minhashLshDf(corpus, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 2L)), "exact dup must be found")
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 2L)),
      s"near-dups must be found, got $pairs")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("incremental gate: fresh docs match the standing corpus, not each other") {
    val existing = corpus.filter($"doc_id" <= 2L)
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank " +
        "while the sun sets slowly behind the tall green hills in the evening"), // ~doc 0/2
      (11L, "entirely novel text with no overlap whatsoever regarding graph " +
        "partitioning strategies for distributed pagerank computation runs"),
      (12L, "entirely novel text with no overlap whatsoever regarding graph " +
        "partitioning strategies for distributed pagerank computation runs"), // dup of 11 — but 11 is NOT in the corpus
    ).toDF("doc_id", "text")
    val rows = Dedup.incrementalDf(existing, fresh, tau = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows(10L)._1, s"near-dup of the corpus must flag: ${rows(10L)}")
    // best match = smallest existing doc_id among the tied exact dups 0 and 2
    assert(rows(10L)._2 == 0L, s"tie must break to smallest id: ${rows(10L)}")
    assert(rows(10L)._3 > 0.8)
    // fresh×fresh pairs are OUT of scope by design — 12 duplicates 11
    // but neither is in the standing corpus, so both pass the gate
    assert(rows(11L) == ((false, -1L, 0.0)))
    assert(rows(12L) == ((false, -1L, 0.0)))
  }

  test("standing index persists: load≡build, and appends close the ingest loop") {
    val existing = corpus.filter($"doc_id" <= 2L)
    val fresh = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river bank " +
        "while the sun sets slowly behind the tall green hills in the evening"),
      (11L, "entirely novel text with no overlap whatsoever regarding graph " +
        "partitioning strategies for distributed pagerank computation runs"),
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupidx").toString
    Dedup.saveStandingIndex(Dedup.standingIndex(existing), dir)
    val loaded = Dedup.loadStandingIndex(spark, dir)
    def verdicts(idx: (org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame), docs: org.apache.spark.sql.DataFrame) =
      Dedup.probeIncremental(idx, docs, tau = 0.5).collect()
        .map(r => r.getLong(0) ->
          ((r.getBoolean(1), r.getLong(2), r.getDouble(3)))).toMap
    // a reloaded index probes identically to the in-memory build
    assert(verdicts(loaded, fresh) ==
      verdicts(Dedup.standingIndex(existing), fresh))
    // the admitted non-dup (11) is appended; the NEXT shard's copy of
    // it must now flag against the grown index — the ingest loop
    Dedup.appendToStandingIndex(fresh.filter($"doc_id" === 11L), dir, "s1")
    val next = Seq((20L, "entirely novel text with no overlap whatsoever " +
      "regarding graph partitioning strategies for distributed pagerank " +
      "computation runs")).toDF("doc_id", "text")
    val grown = verdicts(Dedup.loadStandingIndex(spark, dir), next)
    assert(grown(20L)._1 && grown(20L)._2 == 11L,
      s"appended doc must gate the next shard: ${grown(20L)}")
    // at-least-once retry of a committed shard id is a NO-OP, not a
    // double-append (the _COMMITTED protocol's idempotence contract)
    Dedup.appendToStandingIndex(fresh.filter($"doc_id" === 11L), dir, "s1")
    val reloaded = Dedup.loadStandingIndex(spark, dir)
    assert(reloaded._1.filter($"doc_id" === 11L).count() == 1L,
      "retried append must not duplicate the shard")
    // a half-written shard (tables present, marker absent) is invisible
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dir/shard-s1/_COMMITTED"), false)
    assert(Dedup.loadStandingIndex(spark, dir)._1
      .filter($"doc_id" === 11L).count() == 0L,
      "uncommitted shard must be invisible to load")
  }

  test("standing index rebuild replaces appended shards — no double-counted postings") {
    val existing = corpus.filter($"doc_id" <= 2L)
    val appended = Seq((11L, "entirely novel text with no overlap whatsoever " +
      "regarding graph partitioning strategies for distributed pagerank " +
      "computation runs")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupidx_rb").toString
    Dedup.saveStandingIndex(Dedup.standingIndex(existing), dir)
    Dedup.appendToStandingIndex(appended, dir, "s1")
    // rebuild from the full corpus (which already absorbed doc 11):
    // the old append shard must disappear, not double-count
    Dedup.saveStandingIndex(
      Dedup.standingIndex(existing.unionByName(appended)), dir)
    val (grams, buckets) = Dedup.loadStandingIndex(spark, dir)
    assert(grams.filter($"doc_id" === 11L).count() == 1L,
      "rebuild must carry exactly ONE copy of an absorbed appended doc")
    assert(buckets.groupBy("doc_id", "bk").count()
      .filter($"count" > 1L).count() == 0L,
      "no duplicate (doc, bucket) postings after a rebuild")
  }

  test("simhash finds exact dups at hamming 0 and correlates with similarity") {
    val pairs = Dedup.simhashDf(corpus, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 2L && p._3 == 0),
      s"exact dup must be found at hamming 0, got ${pairs.toSeq}")
    // signature distance must track similarity: near-dup pair closer
    // than any unrelated pair
    import org.apache.spark.sql.functions._
    import graft.functions.Shingles
    val sigs = corpus
      .select(col("doc_id"), Shingles.simhash64(Shingles.grams3(col("text"))).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(0L, 1L) < ham(0L, 3L), "near-dup should be closer than unrelated")
    assert(ham(0L, 1L) < ham(0L, 4L))
  }

  test("minhash LSH recall >= 0.9 vs exact ngram jaccard at tau=0.5 on documents") {
    val docs = graft.core.Tables(spark, Sf).documents
    val truth = Dedup.ngramJaccardDf(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Dedup.minhashLshDf(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "test corpus should contain planted near-dups")
    val recall = truth.count(got.contains).toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall, truth=${truth.size} got=${got.size}")
    // verification step makes precision exact: every reported pair is true
    assert(got.subsetOf(Dedup.ngramJaccardDf(docs, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet))
  }

  test("df-capped ngram jaccard equals uncapped on this corpus") {
    val docs = graft.core.Tables(spark, Sf).documents
    val uncapped = Dedup.ngramJaccardDf(docs, tau = 0.1)
      .collect().map(_.toSeq).toSeq
    // 1000 is the production default (Dedup.ngramJaccard); max df on
    // this corpus is 25 at sf0.1, so the cap must be a no-op
    val capped = Dedup.ngramJaccardDf(docs, tau = 0.1, maxDf = 1000)
      .collect().map(_.toSeq).toSeq
    assert(capped == uncapped)
    assert(uncapped.nonEmpty)
  }

  test("df cap keeps Jaccard exact when boilerplate shingles are dropped") {
    // every doc shares an identical boilerplate header (ubiquitous
    // shingles, df = n); the planted pair additionally shares rare
    // content shingles. A tiny cap drops the boilerplate from
    // candidate generation, but the add-back join must still count it
    // into `inter`, so the pair's Jaccard is identical to uncapped.
    val boiler = "this site uses cookies please accept our terms of service now"
    val corpus = Seq(
      (0L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta iota"),
      (2L, s"$boiler completely different words about catalyst plans"),
      (3L, s"$boiler unrelated content discussing shuffle partitions")
    ).toDF("doc_id", "text")
    // τ=0.6 satisfies the exactness condition: a qualifying pair needs
    // inter ≥ 0.6·|union| ≈ 10 shared shingles, more than the 9
    // all-boilerplate shingles the cap drops — so every τ-pair keeps a
    // sub-cap shared shingle and candidate generation cannot miss it
    val uncapped = Dedup.ngramJaccardDf(corpus, tau = 0.6)
      .collect().map(_.toSeq).toSet
    val capped = Dedup.ngramJaccardDf(corpus, tau = 0.6, maxDf = 3)
      .collect().map(_.toSeq).toSet
    assert(capped == uncapped, s"capped=$capped uncapped=$uncapped")
    // the planted near-dup pair survives, with its exact (add-back
    // corrected) Jaccard; boilerplate-only pairs are below τ
    assert(uncapped.exists(r => r.take(2) == Seq(0L, 1L)), s"got $uncapped")
    assert(!uncapped.exists(r => r.take(2) == Seq(2L, 3L)))
  }

  test("dir-level ngramJaccard: biting cap falls back to the capped plan; no-bite takes the shared fast path") {
    // the dir-level entry decides per corpus: cap bites → full capped
    // formulation (add-back joins); cap doesn't bite → shared cached
    // pair base. Both must equal the Df reference.
    val boiler = "this site uses cookies please accept our terms of service now"
    val corpus = Seq(
      (0L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta iota"),
      (2L, s"$boiler completely different words about catalyst plans"),
      (3L, s"$boiler unrelated content discussing shuffle partitions")
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_capdir").toString
    corpus.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val viaDirCapped = Dedup.ngramJaccard(spark, dir, tau = 0.6, maxDf = 3)
      .collect().map(_.toSeq).toSet
    val reference = Dedup.ngramJaccardDf(corpus, tau = 0.6, maxDf = 3)
      .collect().map(_.toSeq).toSet
    assert(viaDirCapped == reference,
      s"capped dir path $viaDirCapped != $reference")
    val viaDirFast = Dedup.ngramJaccard(spark, dir, tau = 0.6, maxDf = 1000)
      .collect().map(_.toSeq).toSet
    assert(viaDirFast ==
      Dedup.ngramJaccardDf(corpus, tau = 0.6).collect().map(_.toSeq).toSet)
    assert(viaDirCapped.nonEmpty)
  }

  test("components groups transitively (A~B, B~C, A!~C chain)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (20L, 22L))
      .toDF("d1", "d2")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("components of an empty pair set is empty (no pre-loop NPE)") {
    // regression: the old pre-loop seed-sum comparison dereferenced
    // the null aggregate an empty label set produces
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.components(pairs).collect().isEmpty)
  }

  test("components tolerates self-loop pairs (degenerate generic input)") {
    // round 1 changes nothing on a self-loop-only graph; the loop must
    // still converge (one extra idempotent round, not a wrong label)
    val pairs = Seq((5L, 5L), (7L, 7L)).toDF("d1", "d2")
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(5L -> 5L, 7L -> 7L))
  }

  test("components of real near-dup pairs are consistent with the pair set") {
    val pairs = Dedup.ngramJaccardDf(graft.core.Tables(spark, Sf).documents, 0.1)
    val comp = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every pair's two docs share a component, and the component id
    // is a member doc_id (the minimum one)
    pairs.collect().foreach { r =>
      val (d1, d2) = (r.getLong(0), r.getLong(1))
      assert(comp(d1) == comp(d2), s"pair ($d1,$d2) split across components")
    }
    comp.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"component $c is not its min member")
    }
  }

  test("keep-best: one representative per cluster (longest bytes, min-id tie), singletons pass through") {
    import org.apache.spark.sql.functions.{col, expr}
    val tables = graft.core.Tables(spark, Sf)
    val blen = tables.documents
      .select(col("doc_id"), expr("CAST(octet_length(text) AS BIGINT)").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val comp = Dedup.ngramComponents(spark, Sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = Dedup.keepBest(spark, Sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // replay the whole contract driver-side from components + lengths
    val clusters = blen.keys.groupBy(d => comp.getOrElse(d, d))
    assert(kept.keySet == clusters.keySet, "one output row per cluster key")
    clusters.foreach { case (c, members) =>
      val (doc, b, csize) = kept(c)
      assert(csize == members.size, s"cluster $c size")
      val best = members.minBy(d => (-blen(d), d))
      assert(doc == best && b == blen(best),
        s"cluster $c kept $doc, expected $best")
    }
    // total kept = clusters; dropped = corpus - clusters
    assert(kept.size == clusters.size && kept.size <= blen.size)
    // the precomputed-components overload (the persisted-clustering
    // production path) selects the identical manifest
    val viaPrecomputed = Dedup.keepBestFrom(tables.documents,
        Dedup.ngramComponents(spark, Sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(viaPrecomputed == kept)
  }

  test("sketch signatures are map-side kernels (no explode+aggregate in plan)") {
    val docs = graft.core.Tables(spark, Sf).documents
    val mh = Dedup.minhashLshDf(docs, tau = 0.5)
    mh.collect()
    val mhPlan = mh.queryExecution.executedPlan.toString
    assert(mhPlan.contains("minhash_signature"),
      s"minhash signature must come from the one-loop kernel:\n$mhPlan")
    assert(!mhPlan.contains("minhash_agg"),
      s"signature derivation must not explode+aggregate shingle rows:\n$mhPlan")
    val sh = Dedup.simhashDf(docs, maxHamming = 3)
    sh.collect()
    val shPlan = sh.queryExecution.executedPlan.toString
    assert(shPlan.contains("simhash_signature"),
      s"simhash signature must come from the one-loop kernel:\n$shPlan")
    assert(!shPlan.contains("simhash_agg"),
      s"signature derivation must not explode+aggregate shingle rows:\n$shPlan")
  }

  test("embedding dedup agrees with HOF cosine reference") {
    import org.apache.spark.sql.functions._
    import graft.functions.Vectors
    val e = graft.core.Tables(spark, Sf).embeddings.limit(50)
    val diff = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(abs(Vectors.cosineSim(col("a.embedding"), col("b.embedding")) -
        Vectors.cosineHof(col("a.embedding"), col("b.embedding"))).as("d"))
      .agg(max("d")).head().getDouble(0)
    assert(diff < 1e-9, s"custom expression deviates from HOF reference by $diff")
  }

  test("substring spans: shared region found at DIFFERENT offsets (content-defined anchors)") {
    val boiler = "This document is licensed under the standard corpus terms. " +
      "Redistribution permitted with attribution. All rights reserved forever. " +
      "Contact the data team for any questions about usage and provenance."
    def noise(seed: Int) = {
      val r = new scala.util.Random(seed)
      (1 to 120).map(_ => ('a' + r.nextInt(26)).toChar).mkString
    }
    // boilerplate embedded at offset 0, ~120, and ~57 — a fixed
    // stride-32 scheme can only match copies at equal offsets mod 32;
    // anchors travel with the content, so all three must group
    val docs = Seq(
      (10L, boiler + noise(1)),
      (11L, noise(2) + boiler),
      (12L, noise(3).take(57) + boiler + noise(4)),
      (13L, noise(5) + noise(6))).toDF("doc_id", "text")
    val groups = Dedup.substringSpansDf(docs).collect()
    assert(groups.nonEmpty, "planted boilerplate must produce duplicated spans")
    // every reported span involves only the three boilerplate carriers
    val spanDocs = Dedup.substringSpansDf(docs)
      .select("keep_id").collect().map(_.getLong(0)).toSet
    assert(spanDocs == Set(10L), s"keeper should be the smallest carrier: $spanDocs")
    assert(groups.forall(_.getLong(1) == 3L),
      "each boilerplate span recurs in exactly the 3 carrier docs")
  }

  test("containment catches a quoted subset document that Jaccard misses") {
    val short = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val long = "intro words before the quote begins here " + short +
      " and then a very long tail " +
      (1 to 40).map(i => s"unique$i filler$i token$i").mkString(" ")
    val docs = Seq((1L, short), (2L, long),
      (3L, "totally unrelated third document about catalyst plans and shuffles"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentDf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getDouble(4)))
    assert(cont.map(t => (t._1, t._2)).toSeq == Seq((1L, 2L)))
    assert(cont.head._3 == 1.0, s"short doc fully contained: ${cont.head}")
    // the same pair must NOT pass a jaccard 0.5 gate (sizes differ ~15x)
    val jac = Dedup.ngramJaccardDf(docs, tau = 0.5).collect()
    assert(jac.isEmpty, "jaccard gate must miss the subset pair")
  }

  test("sweep: every bank row equals a standalone run at that threshold") {
    import org.apache.spark.sql.functions.col
    val embs = graft.core.Tables(spark, Sf).embeddings
    val rows = Dedup.sweep(spark, Sf).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Dedup.SweepThresholds.toSet)
    Dedup.SweepThresholds.foreach { t =>
      val pairs = Dedup.embeddingDf(embs, t)
        .select(col("v1"), col("v2")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val docs = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      assert(rows(t) == (pairs.length.toLong, docs.length.toLong),
        s"threshold $t: sweep ${rows(t)} vs standalone (${pairs.length}, ${docs.length})")
    }
    // the sweep is monotone: tighter thresholds never gain pairs
    val ordered = Dedup.SweepThresholds.map(rows(_)._1)
    assert(ordered.sameElements(ordered.sorted.reverse))
  }

  test("jaccard sweep: every bank row equals a standalone run at that threshold") {
    val docs = graft.core.Tables(spark, Sf).documents
    val rows = Dedup.sweepJaccard(spark, Sf).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Dedup.JaccardSweepThresholds.toSet)
    Dedup.JaccardSweepThresholds.foreach { t =>
      val pairs = Dedup.ngramJaccardDf(docs, tau = t)
        .select($"d1", $"d2").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val affected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      assert(rows(t) == (pairs.length.toLong, affected.length.toLong),
        s"threshold $t: sweep ${rows(t)} vs standalone " +
          s"(${pairs.length}, ${affected.length})")
    }
    val ordered = Dedup.JaccardSweepThresholds.map(rows(_)._1)
    assert(ordered.sameElements(ordered.sorted.reverse))
    assert(rows(Dedup.JaccardSweepThresholds.min)._1 > 0,
      "the planted corpus must have pairs at the lowest bound")
  }

  test("lsh banding sweep: nested candidates, monotone recall, 8-band row equals the gated run") {
    val rows = Dedup.sweepLsh(spark, Sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(rows.keySet == Dedup.LshBandSweep.map(_.toLong).toSet)
    Dedup.LshBandSweep.foreach { b =>
      assert(rows(b.toLong)._1 == 32L / b, s"rows_per_band at $b bands")
    }
    // a coarse band is a concatenation of finer bands, so candidate
    // sets are NESTED: counts monotone non-decreasing in band count
    val ordered = Dedup.LshBandSweep.map(b => rows(b.toLong))
    ordered.sliding(2).foreach { case Seq(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._5 <= b._5,
        s"banding sweep must be monotone: $ordered")
    case _ =>
    }
    // the (8, 4) row IS the gated dedup_minhash_lsh configuration
    val gated = Dedup.minhashLsh(spark, Sf).count()
    assert(rows(8L)._3 == gated,
      s"8-band verified count ${rows(8L)._3} != gated $gated")
    // truth column is shared and equals the exact pair count
    val truth = Dedup.ngramJaccard(spark, Sf, tau = 0.5).count()
    assert(rows(8L)._4 == truth)
  }

  test("substring spans: disjoint texts produce no groups") {
    val docs = Seq(
      (1L, ("alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4)),
      (2L, ("one two three four five six seven eight nine ten eleven " * 4)))
      .toDF("doc_id", "text")
    assert(Dedup.substringSpansDf(docs).collect().isEmpty)
  }
}
