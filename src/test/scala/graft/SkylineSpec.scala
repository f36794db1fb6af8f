package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Two-phase distributed skyline: brute-force equivalence,
  * partitioning invariance, and mutual-tie retention. */
class SkylineSpec extends SparkSpecBase {
  import spark.implicits._

  private def dominated(a: (Long, Long, Long), b: (Long, Long, Long)) =
    b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3)

  test("skyline equals the brute-force dominance scan") {
    val pts = spark.read.parquet(s"$Sf/orders.parquet")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long")).as("tot"),
        count(lit(1)).as("n"))
      .select(col("o_custkey"), expr("tot DIV n"), col("n"))
      .as[(Long, Long, Long)].collect()
    val want = pts.filter(a => !pts.exists(b => dominated(a, b))).toSet
    val got = Skyline.qSkyline(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("skyline is invariant under partitioning") {
    val base = Seq.tabulate(200) { i =>
      (i.toLong, ((i * 7919) % 101).toLong, ((i * 104729) % 97).toLong)
    }
    val expect = base.filter(a => !base.exists(b => dominated(a, b))).toSet
    for (parts <- Seq(1, 3, 16)) {
      val df = base.toDF("id", "d1", "d2").repartition(parts)
      val got = Skyline.skylineDf(df).collect().toSet
      assert(got == expect, s"partitioning with $parts changed the skyline")
    }
  }

  test("exact-tie points are mutually undominated and all survive") {
    val df = Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 4L, 9L), (4L, 4L, 4L))
      .toDF("id", "d1", "d2").repartition(2)
    val got = Skyline.skylineDf(df).collect().toSet
    assert(got == Set((1L, 5L, 5L), (2L, 5L, 5L), (3L, 4L, 9L)))
  }
}
