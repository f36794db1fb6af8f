package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKScoreAgg

/** The bounded top-k aggregate matches the window formulation it
  * replaces — including tie-breaks, duplicate candidates, and
  * cross-partition merges. */
class TopKScoreSpec extends SparkSpecBase {
  import spark.implicits._

  private def topkVia(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(TopKScoreAgg.topk(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), (col("pos") + 1).as("r"), col("col.id"), col("col.score"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("matches row_number window semantics incl. score ties broken by id asc") {
    val rows = Seq(
      (1, 10L, 0.9), (1, 11L, 0.9), (1, 12L, 0.5), (1, 13L, 1.0), (1, 14L, 0.1),
      (2, 20L, 0.3), (2, 21L, 0.3), (2, 22L, 0.3))
    val df = rows.toDF("g", "id", "s").repartition(7)
    val got = topkVia(df, 3)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex.map { case ((_, id, s), i) =>
        (g, i + 1, id, s)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("duplicate (score, id) candidates collapse exactly (no distinct needed)") {
    val rows = Seq((1, 10L, 0.9), (1, 10L, 0.9), (1, 10L, 0.9),
      (1, 11L, 0.8), (1, 11L, 0.8), (1, 12L, 0.7))
    val got = topkVia(rows.toDF("g", "id", "s").repartition(5), 2)
    assert(got == Seq((1, 1, 10L, 0.9), (1, 2, 11L, 0.8)))
  }

  test("randomized property: agrees with reference sort under ties, dups, partitioning") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 8) {
      val n = 50 + rnd.nextInt(400)
      // coarse score grid forces many exact ties; id range forces
      // duplicate (score, id) pairs across partitions
      val rows = (0 until n).map { _ =>
        (rnd.nextInt(3), rnd.nextInt(40).toLong, rnd.nextInt(10) / 10.0)
      }
      val k = 1 + rnd.nextInt(7)
      val parts = 1 + rnd.nextInt(16)
      val got = topkVia(rows.toDF("g", "id", "s").repartition(parts), k)
      val want = rows.distinct.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
        rs.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case ((_, id, s), i) => (g, i + 1, id, s)
        }
      }.sortBy(t => (t._1, t._2))
      assert(got == want, s"trial $trial (n=$n k=$k parts=$parts)")
    }
  }

  test("groups smaller than k emit all entries; merge across many partitions") {
    val n = 1000
    val rows = (0 until n).map(i => (i % 4, i.toLong, (i % 97).toDouble))
    val got = topkVia(rows.toDF("g", "id", "s").repartition(32), 5)
    val want = rows.groupBy(_._1).toSeq.flatMap { case (g, rs) =>
      rs.sortBy(r => (-r._3, r._2)).take(5).zipWithIndex.map { case ((_, id, s), i) =>
        (g, i + 1, id, s)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == want)
    val small = topkVia(Seq((9, 1L, 0.5)).toDF("g", "id", "s"), 5)
    assert(small == Seq((9, 1, 1L, 0.5)))
  }
}
