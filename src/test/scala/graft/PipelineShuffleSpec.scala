package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Curation
import graft.sources.IO

/** Deterministic training shuffle ([[Curation.pipelineShuffle]]) and
  * its shard writer ([[IO.writeShuffledShards]]).
  *
  * The load-bearing contracts:
  *  - the assignment is a pure row-local function: shard ≡ skey mod N,
  *    keys in [0, 2⁶⁰), bit-identical under any input partitioning;
  *  - epochs decorrelate: a different epoch permutes and re-shards
  *    the SAME document set differently;
  *  - the writer lays each shard out as sorted runs: every output
  *    file is non-decreasing in (skey, doc_id), the union of shards
  *    is exactly the corpus, and `filesPerShard > 1` preserves both
  *    (the k-way-merge read contract).
  *
  * The corpus-wide twin is the `pipeline_shuffle` oracle gate. */
class PipelineShuffleSpec extends SparkSpecBase {

  import spark.implicits._

  private def docs(n: Int): DataFrame =
    spark.range(1, n + 1).select($"id".as("doc_id"))

  test("assignment is row-local: shard = skey mod N, partition-invariant") {
    val a = Curation.pipelineShuffleDf(docs(500))
    assert(a.filter(pmod($"skey", lit(Curation.ShuffleShards.toLong))
      =!= $"shard").count() == 0)
    assert(a.filter($"skey" < 0 || $"skey" >= (1L << 60)).count() == 0)
    val b = Curation.pipelineShuffleDf(docs(500).repartition(7))
    assert(a.orderBy("doc_id").collect().toSeq ==
      b.orderBy("doc_id").collect().toSeq)
    // 500 docs over 16 shards: every shard populated
    assert(a.select("shard").distinct().count() ==
      Curation.ShuffleShards.toLong)
  }

  test("epochs decorrelate the permutation over the same doc set") {
    val e0 = Curation.pipelineShuffleDf(docs(300), epoch = 0)
    val e1 = Curation.pipelineShuffleDf(docs(300), epoch = 1)
    assert(e0.select("doc_id").orderBy("doc_id").collect().toSeq ==
      e1.select("doc_id").orderBy("doc_id").collect().toSeq)
    val moved = e0.as("a").join(e1.as("b"), "doc_id")
      .filter($"a.shard" =!= $"b.shard").count()
    // re-salting re-shards ~15/16 of docs; >= half is a safe floor
    assert(moved >= 150, s"only $moved of 300 docs changed shard")
  }

  test("writer emits sorted runs per file; union of shards = corpus") {
    for (fps <- Seq(1, 2)) {
      val a = Curation.pipelineShuffleDf(docs(400))
      val dir = Files.createTempDirectory("graft_shuf").toFile
      IO.writeShuffledShards(a, dir.getAbsolutePath, filesPerShard = fps)
      val shardDirs = dir.listFiles().filter(_.getName.startsWith("shard="))
      assert(shardDirs.length == Curation.ShuffleShards)
      var total = 0L
      for (sd <- shardDirs) {
        val shard = sd.getName.stripPrefix("shard=").toLong
        for (f <- sd.listFiles().filter(_.getName.endsWith(".parquet"))) {
          val rows = spark.read.parquet(f.getAbsolutePath)
            .select("skey", "doc_id")
            .collect().map(r => (r.getLong(0), r.getLong(1)))
          assert(rows.sameElements(rows.sorted),
            s"file ${f.getName} of shard $shard is not a sorted run")
          assert(rows.forall(_._1 % Curation.ShuffleShards == shard))
          total += rows.length
        }
      }
      assert(total == 400L, s"filesPerShard=$fps lost rows: $total")
    }
  }
}
