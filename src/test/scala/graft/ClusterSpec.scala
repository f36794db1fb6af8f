package graft

import org.apache.spark.sql.functions._

import graft.operators.Cluster

/** Integer-exact Lloyd's k-means: partitioning invariants,
  * improvement over rounds, and recovery of planted structure. */
class ClusterSpec extends SparkSpecBase {
  import spark.implicits._

  test("kmeans: every vector is assigned exactly once") {
    val out = Cluster.embKmeans(spark, Sf).collect()
    val n = spark.read.parquet(s"$Sf/embeddings.parquet").count()
    assert(out.map(_.getLong(1)).sum == n, "assignments partition the corpus")
    assert(out.map(_.getLong(0)).toSet.subsetOf((0L until 8L).toSet))
    assert(out.forall(_.getLong(2) >= 0L), "squared distances are non-negative")
  }

  test("kmeans: more Lloyd's rounds never worsen total inertia") {
    def inertia(iters: Int): Long =
      Cluster.kmeansDf(spark.read.parquet(s"$Sf/embeddings.parquet"), 8, iters)
        .agg(sum("inertia")).as[Long].head()
    val i1 = inertia(1)
    val i3 = inertia(3)
    assert(i3 <= i1, s"inertia after 3 rounds ($i3) vs 1 round ($i1)")
  }

  test("kmeans: recovers well-separated planted clusters") {
    // two tight blobs far apart: one round should already split them
    // perfectly, whatever the hash-seeded initialization picked
    val rows = (0 until 20).map { i =>
      val base = if (i % 2 == 0) 10.0f else -10.0f
      val jitter = (i / 2) * 0.01f
      (i.toLong, Array(base + jitter, base - jitter, base, base))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = Cluster.kmeansDf(df, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.values.toSeq.sorted == Seq(10L, 10L),
      s"two balanced clusters expected, got $out")
  }
}
