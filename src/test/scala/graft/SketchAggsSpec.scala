package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, SketchAggs}
import graft.functions.Shingles

/** The imperative sketch aggregates are bit-compatible with their
  * declarative multi-column formulations (same [[PortableHash]]
  * family the DuckDB oracle reproduces). */
class SketchAggsSpec extends SparkSpecBase {

  private lazy val hashes = graft.core.Tables(spark, Sf).documents
    .select(col("doc_id"), Shingles.grams3(col("text")).as("grams"))
    .select(col("doc_id"), explode(col("grams")).as("gram"))
    .select(col("doc_id"), PortableHash.h60(col("gram")).as("h"))

  test("MinHashAgg equals k separate min((a_i*h + b_i) mod P) columns") {
    val k = 32
    val (as, bs) = PortableHash.affineParams(k)
    val imperative = hashes.groupBy("doc_id")
      .agg(SketchAggs.minhashAgg(col("h"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val declarative = hashes.groupBy("doc_id")
      .agg(min(PortableHash.salted(col("h"), as(0), bs(0))).as("m0"),
        (1 until k).map(i =>
          min(PortableHash.salted(col("h"), as(i), bs(i))).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) ->
        (0 until k).map(i => r.getLong(i + 1)).toSeq).toMap
    assert(imperative == declarative)
    assert(imperative.nonEmpty)
  }

  private lazy val gramTable = graft.core.Tables(spark, Sf).documents
    .select(col("doc_id"), Shingles.grams3(col("text")).as("grams"))

  test("MinHashSignature kernel equals explode + MinHashAgg on real documents") {
    val k = 32
    val kernel = gramTable
      .select(col("doc_id"),
        graft.functions.SketchExprs.minhashSig(col("grams"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val agg = hashes.groupBy("doc_id")
      .agg(SketchAggs.minhashAgg(col("h"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel == agg)
    assert(kernel.nonEmpty)
  }

  test("SimHashSignature kernel equals explode + SimHashAgg on real documents") {
    val kernel = gramTable
      .select(col("doc_id"),
        graft.functions.SketchExprs.simhashSig(col("grams")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = hashes.groupBy("doc_id")
      .agg(SketchAggs.simhashAgg(col("h")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel == agg)
    assert(kernel.nonEmpty)
  }

  test("GramHashes kernel equals h60 per exploded row (incl. null elements)") {
    val kernel = gramTable
      .select(col("doc_id"),
        explode(graft.functions.SketchExprs.gramHashes(col("grams"))).as("gid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val perRow = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(kernel == perRow)
    assert(kernel.nonEmpty)
    // null element → null hash, exactly as h60(NULL) evaluates
    val withNull = spark.range(1)
      .select(expr("array('a b c', NULL, 'b c d')").as("g"))
    val hs = withNull
      .select(graft.functions.SketchExprs.gramHashes(col("g")).as("hs"))
      .head().getSeq[Any](0)
    assert(hs.size == 3 && hs(1) == null && hs(0) != null && hs(2) != null)
  }

  test("sketch kernels: empty array is neutral, null array is null") {
    val df = spark.range(1)
      .select(expr("array('a b c', 'b c d')").as("g"),
        expr("array()").cast("array<string>").as("empty"),
        expr("CAST(NULL AS array<string>)").as("nul"))
    val r = df.select(
      graft.functions.SketchExprs.minhashSig(col("empty"), 4).as("me"),
      graft.functions.SketchExprs.minhashSig(col("nul"), 4).as("mn"),
      graft.functions.SketchExprs.simhashSig(col("empty")).as("se"),
      graft.functions.SketchExprs.simhashSig(col("nul")).as("sn")).head()
    assert(r.getSeq[Long](0) == Seq.fill(4)(Long.MaxValue))
    assert(r.isNullAt(1))
    assert(r.getLong(2) == 0L)
    assert(r.isNullAt(3))
  }

  test("SimHashAgg equals the 64-column sum-of-votes formulation") {
    def vote(j: Int) =
      when(shiftright(col("h"), j).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
        .otherwise(lit(-1L))
    val votes = hashes.groupBy("doc_id")
      .agg(sum(vote(0)).as("b0"), (1 until 64).map(j => sum(vote(j)).as(s"b$j")): _*)
    val packed = (0 until 64).map(j =>
      shiftleft(when(col(s"b$j") > 0, lit(1L)).otherwise(lit(0L)), j))
      .reduce(_ bitwiseOR _)
    val declarative = votes.select(col("doc_id"), packed.as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val imperative = hashes.groupBy("doc_id")
      .agg(SketchAggs.simhashAgg(col("h")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(imperative == declarative)
  }

  test("CountMinAgg: row mass = token count; estimates never under-count") {
    val depth = 4
    val width = 64
    val n = hashes.count()
    val cms = hashes
      .agg(SketchAggs.countMinAgg(col("h"), depth, width).as("cms"))
      .head().getSeq[Long](0)
    assert(cms.length == depth * width)
    // every row of the matrix absorbs each input token exactly once
    (0 until depth).foreach { i =>
      assert(cms.slice(i * width, (i + 1) * width).sum == n)
    }
    // CMS one-sided error: estimate >= exact count, for every word
    val rows = graft.operators.TextMR.cmsFreq(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"${r.getString(0)}: est ${r.getLong(2)} < cnt ${r.getLong(1)}")
    }
    // with 31 distinct words in 64 buckets, some word must collide in
    // at least one row yet still resolve exactly through the min —
    // assert the sketch is actually exercised (not all-identity)
    assert(rows.map(_.getLong(1)).sum == spark.read
      .parquet(s"$Sf/documents.parquet")
      .select(explode(graft.functions.TokenCol.letterTokens(col("text"))))
      .count())
  }

  test("HllAgg registers equal the declarative group-by-max formulation") {
    import graft.functions.Hll
    val ev = graft.core.Tables(spark, Sf).events
      .select(col("event_type"), PortableHash.h60(
        concat(lit("hll#"), col("user_id").cast("string"))).as("hv"))
    val imperative = ev.groupBy("event_type")
      .agg(Hll.hllAgg(col("hv")).as("regs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // declarative twin: bucket/rank in SQL text — the SAME generated
    // CASE chain the DuckDB oracle runs
    val declarative = ev
      .select(col("event_type"), pmod(col("hv"), lit(Hll.M.toLong)).as("bucket"),
        expr(s"hv div ${Hll.M}").as("v"))
      .withColumn("rank", expr(Hll.rankCaseSql("v")))
      .groupBy("event_type", "bucket").agg(max("rank").as("reg"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt) -> r.getInt(2))
      .toMap
    imperative.foreach { case (et, regs) =>
      assert(regs.length == Hll.M)
      regs.zipWithIndex.foreach { case (reg, b) =>
        assert(reg == declarative.getOrElse((et, b), 0).toLong,
          s"register mismatch at ($et, $b)")
      }
    }
    assert(imperative.nonEmpty)
  }

  test("HLL estimate: accurate vs exact and invariant to partitioning") {
    val a = graft.operators.Profile.hllUsers(spark, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.nonEmpty)
    a.foreach { case (et, exact, est, relErr) =>
      assert(exact > 0 && est > 0)
      assert(relErr <= 0.15, s"$et: est $est vs exact $exact (err $relErr)")
    }
    // merge-order / partitioning invariance: registers max-merge, so
    // the estimate is bit-identical however the rows are distributed
    val sp2 = spark.newSession()
    sp2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = graft.operators.Profile.hllUsers(sp2, Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("HLL raw-harmonic branch: 50k distincts estimate within 10%") {
    import graft.functions.Hll
    // the events corpus sits in the linear-counting regime at every
    // SF (n ≤ 2.5m); this pins the large-cardinality branch
    val n = 50000L
    val est = spark.range(n)
      .select(PortableHash.h60(concat(lit("hll#"), col("id").cast("string"))).as("hv"))
      .agg(Hll.hllAgg(col("hv")).as("regs"))
      .withColumn("n_present", expr("size(filter(regs, r -> r > 0))"))
      .withColumn("z_present", expr(
        s"aggregate(filter(regs, r -> r > 0), CAST(0 AS BIGINT), " +
          s"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), CAST(${Hll.W + 1} - r AS INT)))"))
      .withColumn("est", expr(Hll.estimateSql("n_present", "z_present")))
      .head().getAs[Double]("est")
    assert(math.abs(est - n) / n < 0.10, s"est $est vs $n")
    assert(est > 2.5 * Hll.M, "must exercise the raw branch")
  }

  test("countmin_agg is callable from SQL") {
    GraftFunctions.register(spark)
    graft.core.Tables(spark, Sf).documents.createOrReplaceTempView("docs_cms")
    val r = spark.sql(
      """SELECT countmin_agg(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT), 4, 64) AS m
         FROM (SELECT explode(ascii_tokens(text)) AS w FROM docs_cms)""")
      .head().getSeq[Long](0)
    assert(r.length == 256 && r.sum > 0)
  }

  test("hll_agg is callable from SQL") {
    GraftFunctions.register(spark)
    graft.core.Tables(spark, Sf).documents.createOrReplaceTempView("docs_hll")
    val r = spark.sql(
      """SELECT hll_agg(CAST(conv(substring(md5(w), 1, 15), 16, 10) AS BIGINT)) AS regs
         FROM (SELECT explode(ascii_tokens(text)) AS w FROM docs_hll)""")
      .head().getSeq[Long](0)
    assert(r.length == graft.functions.Hll.M && r.exists(_ > 0))
  }

  test("bottomk_sample is callable from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT bottomk_sample(
           CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT),
           CAST(id % 7 AS DOUBLE), 16) AS samp
         FROM range(200)""").head().getSeq[Double](0)
    assert(r.length == 16 && r == r.sorted)
  }

  test("BottomKSampleAgg: k >= n returns all values sorted; k < n matches the window rank") {
    import graft.functions.BottomKSampleAgg
    val rows = spark.range(0, 500)
      .select(col("id"), PortableHash.h60(col("id").cast("string")).as("h"),
        (col("id") % 37).cast("double").as("v"))
    // k >= n: the "sample" is the full value multiset, sorted
    val all = rows.agg(BottomKSampleAgg.bottomk(col("h"), col("v"), 1000))
      .head().getSeq[Double](0)
    assert(all == rows.select("v").collect().map(_.getDouble(0)).sorted.toSeq)
    // k < n: exactly the values of the k hash-smallest rows
    val expected = rows.orderBy(col("h"), col("v")).limit(64)
      .select("v").collect().map(_.getDouble(0)).sorted.toSeq
    val got = rows.agg(BottomKSampleAgg.bottomk(col("h"), col("v"), 64))
      .head().getSeq[Double](0)
    assert(got == expected)
  }

  test("BottomKSampleAgg: merge-invariant across partitionings") {
    import graft.functions.BottomKSampleAgg
    def sample(parts: Int) = spark.range(0, 2000)
      .repartition(parts)
      .select(PortableHash.h60(col("id").cast("string")).as("h"),
        (col("id") * col("id") % 101).cast("double").as("v"))
      .agg(BottomKSampleAgg.bottomk(col("h"), col("v"), 100))
      .head().getSeq[Double](0)
    assert(sample(1) == sample(13))
  }
}
