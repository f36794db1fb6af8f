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

  test("zorder: manifest is partition-invariant") {
    val xy = spark.range(10000).select(
      pmod(col("id") * 37L, lit(501L)).as("x"),
      pmod(col("id") * 11L, lit(997L)).as("y"))
    val a = Layout.zorderManifestDf(xy).collect().toSeq
    val b = Layout.zorderManifestDf(xy.repartition(7)).collect().toSeq
    assert(a == b, "pure multiset function of the input")
  }
}
