package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout contracts: the bit interleave, the per-file
  * clustering bound on BOTH dimensions (the property a plain sort
  * cannot give), and closed-form behavior on a planted grid. */
class LayoutSpec extends SparkSpecBase {

  test("zorder: planted uniform grid fills all 16 files evenly") {
    // x, y ∈ 0..255 product grid: buckets are the identity, z is a
    // bijection 0..65535, so each of the 16 files holds exactly
    // 65536/16 rows and both dims span exactly a quarter-range
    val xy = spark.range(65536).select(
      (col("id") / 256).cast("long").as("x"),
      (col("id") % 256).cast("long").as("y"))
    val rows = Layout.zorderManifestDf(xy).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      assert(r.getLong(1) == 4096L, "uniform grid → even file fill")
      assert(r.getLong(3) - r.getLong(2) == 63L, "x spans exactly 64 values")
      assert(r.getLong(5) - r.getLong(4) == 63L, "y spans exactly 64 values")
    }
    // file ids are the full 0..15 set, presentation-sorted
    assert(rows.map(_.getLong(0)).toSeq == (0L until 16L))
  }

  test("zorder: both dimensions cluster within a quarter-range per file") {
    // the z-order claim on the real corpus: within one file the top 2
    // bucket bits of EACH dim are fixed, so each dim's raw span is
    // ≤ range/4 + 1 (bucket-edge rounding) — a single-column sort
    // would bound one dim and leave the other spanning ~everything
    val o = graft.core.Tables(spark, Sf).orders
      .select(col("o_custkey").as("x"),
        expr("CAST(o_orderdate AS BIGINT) div 86400").as("y"))
    val b = o.agg(min("x"), max("x"), min("y"), max("y")).head()
    val xRange = b.getLong(1) - b.getLong(0) + 1
    val yRange = b.getLong(3) - b.getLong(2) + 1
    Layout.zorderManifestDf(o).collect().foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= xRange / 4 + 1,
        s"file ${r.getLong(0)}: x span ${r.getLong(3) - r.getLong(2)} " +
          s"exceeds quarter-range ${xRange / 4}")
      assert(r.getLong(5) - r.getLong(4) <= yRange / 4 + 1,
        s"file ${r.getLong(0)}: y span ${r.getLong(5) - r.getLong(4)} " +
          s"exceeds quarter-range ${yRange / 4}")
    }
  }

  test("zorder writer: files cover disjoint z ranges, sorted within") {
    val xy = spark.range(20000).select(
      pmod(col("id") * 37L, lit(1009L)).as("x"),
      pmod(col("id") * 11L, lit(997L)).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zord").toFile
    graft.sources.IO.writeZOrdered(xy, dir.getAbsolutePath, "x", "y")
    val back = spark.read.parquet(dir.getAbsolutePath)
      .select(input_file_name().as("f"), col("z"), col("x"), col("y"))
    assert(back.count() == 20000, "layout must not drop or duplicate rows")
    // disjoint z intervals per file — the contract parquet footer
    // pruning needs: a z-range predicate touches ≤ its share of files
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file z ranges overlap: hi $hi1 vs next lo $lo2")
      case _ =>
    }
    // sorted runs within each file: collect preserves per-file read
    // order, and Scala groupBy preserves encounter order per group
    val byFile = back.select("f", "z").collect()
      .groupBy(_.getString(0)).values
    byFile.foreach { rows =>
      val zs = rows.map(_.getLong(1))
      assert(zs.sameElements(zs.sorted), "z must be non-decreasing per file")
    }
  }

  test("zorder: manifest is partition-invariant") {
    val xy = spark.range(10000).select(
      pmod(col("id") * 37L, lit(501L)).as("x"),
      pmod(col("id") * 11L, lit(997L)).as("y"))
    val a = Layout.zorderManifestDf(xy).collect().toSeq
    val b = Layout.zorderManifestDf(xy.repartition(7)).collect().toSeq
    assert(a == b, "pure multiset function of the input")
  }

  test("zorder: negative dimensions fail fast instead of yielding an unclustered layout") {
    import spark.implicits._
    val bad = Seq((5L, 3L), (-1L, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      Layout.zorderManifestDf(bad).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("zorderKey"),
      s"expected the zorderKey guard, got: ${e.getMessage}")
    // non-negative inputs are untouched by the guard
    val ok = Seq((0L, 0L), (5L, 3L)).toDF("x", "y")
    assert(Layout.zorderManifestDf(ok).collect().nonEmpty)
  }
}
