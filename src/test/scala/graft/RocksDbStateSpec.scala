package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.Streams

/** The streaming tier under the RocksDB state store — the provider
  * configuration that survives production state sizes (session maps,
  * funnel chains, dedup gates): state lives off-heap in RocksDB with
  * changelog/snapshot files under the checkpoint, instead of the
  * default HDFS-backed in-memory map that must FIT on the executor
  * heap. One config switch
  * (`spark.sql.streaming.stateStore.providerClass`), zero operator
  * changes — this spec re-runs the checkpoint-recovery and
  * two-batch-split discipline under the swapped provider and pins
  * the answers to the single-pass/default-provider truth, so the
  * production configuration is proven, not assumed. BenchStream's
  * `sessionize_rocksdb` row prices the swap. */
class RocksDbStateSpec extends SparkSpecBase {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the RocksDB provider set on the session conf
    * (read at query START, so per-test scoping is sound), restoring
    * the prior provider afterwards — later suites on the shared
    * session see the default again. */
  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private lazy val path: String = {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_rocks_stream")
    Files.copy(Paths.get(s"$Sf/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("sessionizer state survives a checkpointed restart under RocksDB") {
    withRocksDb {
      import java.nio.file._
      val raw = graft.core.Tables(spark, Sf).events
      val cutUs = raw.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0).toLong
      val watch = Files.createTempDirectory("graft_rocks_in")
      val ckpt = Files.createTempDirectory("graft_rocks_st").toString
      val outDir = Files.createTempDirectory("graft_rocks_out").toString

      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory("graft_rocks_half").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, watch.resolve(name))
      }

      def runPhase(): Unit = {
        val q = Streams.sessionizeWithState(spark,
            Streams.readEvents(spark, watch.toString))
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half1.parquet")
      runPhase()
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half2.parquet")
      runPhase() // restart: offsets + session state recover from RocksDB files

      val twoPhase = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(twoPhase.length == twoPhase.toSet.size,
        "duplicate sessions after RocksDB restart")
      // the final answer equals the single-pass run (itself pinned to
      // the batch sessionizer by StreamingSpec under the default
      // provider — transitively: RocksDB ≡ default ≡ batch)
      val single = Streams.runToMemory(
        Streams.sessionizeWithState(spark, Streams.readEvents(spark, path)),
        "rocks_single", OutputMode.Append())
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(twoPhase.toSet == single,
        s"two-phase=${twoPhase.length} single=${single.size}")
      assert(single.nonEmpty)
    }
  }

  test("gap-fill two-batch split equals the single pass under RocksDB") {
    withRocksDb {
      import java.nio.file._
      val raw = graft.core.Tables(spark, Sf).events
      val cutUs = raw.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0).toLong
      val watch = Files.createTempDirectory("graft_rocks_gf_in")
      val ckpt = Files.createTempDirectory("graft_rocks_gf_st").toString
      val outDir = Files.createTempDirectory("graft_rocks_gf_out").toString

      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory("graft_rocks_gf_half").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, watch.resolve(name))
      }

      def runPhase(): Unit = {
        val q = Streams.gapFillStream(spark,
            Streams.readEvents(spark, watch.toString))
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half1.parquet")
      runPhase()
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half2.parquet")
      runPhase()

      val twoPhase = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4)))
      assert(twoPhase.length == twoPhase.toSet.size,
        "duplicate filled days after RocksDB restart")
      val single = Streams.runToMemory(
        Streams.gapFillStream(spark, Streams.readEvents(spark, path)),
        "rocks_gf_single", OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
          r.getDouble(3), r.getDouble(4))).toSet
      assert(twoPhase.toSet == single,
        s"two-phase=${twoPhase.length} single=${single.size}")
      assert(single.nonEmpty)
    }
  }

  test("funnel state survives a checkpointed restart under RocksDB") {
    withRocksDb {
      import java.nio.file._
      val raw = graft.core.Tables(spark, Sf).events
      val cutUs = raw.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0).toLong
      val watch = Files.createTempDirectory("graft_rocks_fn_in")
      val ckpt = Files.createTempDirectory("graft_rocks_fn_st").toString
      val outDir = Files.createTempDirectory("graft_rocks_fn_out").toString

      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory("graft_rocks_fn_half").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, watch.resolve(name))
      }

      def runPhase(): Unit = {
        val q = Streams.funnelStream(spark,
            Streams.readEvents(spark, watch.toString))
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half1.parquet")
      runPhase()
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half2.parquet")
      runPhase() // restart: per-user view/chain lists recover from RocksDB

      val twoPhase = spark.read.parquet(outDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      // exactly-once: a view resolving twice means the recovered state
      // re-played a chain it had already closed
      assert(twoPhase.map(_._2).distinct.length == twoPhase.length,
        "a view resolved more than once after the RocksDB restart")
      val single = Streams.runToMemory(
        Streams.funnelStream(spark, Streams.readEvents(spark, path)),
        "rocks_fn_single", OutputMode.Append())
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(twoPhase.toSet == single,
        s"two-phase=${twoPhase.length} single=${single.size}")
      assert(single.nonEmpty)
    }
  }

  test("as-of join state survives a checkpointed restart under RocksDB") {
    withRocksDb {
      import java.nio.file._
      val raw = graft.core.Tables(spark, Sf).events
      val cutUs = raw.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0).toLong
      val watch = Files.createTempDirectory("graft_rocks_ao_in")
      val ckpt = Files.createTempDirectory("graft_rocks_ao_st").toString
      val outDir = Files.createTempDirectory("graft_rocks_ao_out").toString

      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory("graft_rocks_ao_half").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, watch.resolve(name))
      }

      def runPhase(): Unit = {
        val q = Streams.asofStream(spark,
            Streams.readEvents(spark, watch.toString))
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }

      stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half1.parquet")
      runPhase()
      stage(raw.filter(unix_micros(col("ts")) > cutUs), "half2.parquet")
      runPhase() // restart: per-user pending/purchase register recovers

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) -1L else r.getLong(2))
      val twoPhase = spark.read.parquet(outDir).collect().map(key)
      assert(twoPhase.length == twoPhase.toSet.size,
        "duplicate matches after the RocksDB restart")
      // matches that SPAN the split (purchase in half 1, error in
      // half 2) only work if lastPurchase survived inside RocksDB
      val single = Streams.runToMemory(
        Streams.asofStream(spark, Streams.readEvents(spark, path)),
        "rocks_ao_single",
        org.apache.spark.sql.streaming.OutputMode.Append())
        .collect().map(key).toSet
      assert(twoPhase.toSet == single,
        s"two-phase=${twoPhase.length} single=${single.size}")
      assert(single.nonEmpty)
    }
  }

  test("markov two-batch split under RocksDB equals the batch lead window") {
    withRocksDb {
      import java.nio.file._
      val raw = graft.core.Tables(spark, Sf).events
      val cutUs = raw.agg(expr("percentile(unix_micros(ts), 0.5)"))
        .head().getDouble(0).toLong
      val watch = Files.createTempDirectory("graft_rocks_mkv_in")

      def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = Files.createTempDirectory("graft_rocks_mkv_half").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        Files.copy(part.toPath, watch.resolve(name))
      }

      // two batches: the per-user LastEvent register must carry the
      // boundary inside RocksDB so cross-batch adjacencies still emit
      stage(raw.filter(unix_micros(col("ts")) <= cutUs), "half1.parquet")
      val q = Streams.markovStream(spark,
          Streams.readEvents(spark, watch.toString))
        .writeStream.format("memory").queryName("rocks_mkv_split")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        stage(raw.filter(unix_micros(col("ts")) > cutUs), "half2.parquet")
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("rocks_mkv_split")
        .groupBy("from_type", "to_type").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val want = operators.Events.qMarkov(spark, Sf).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == want,
        "drained transition multiset must equal the batch lead window")
    }
  }

  test("the RocksDB provider is genuinely active for the scoped query") {
    withRocksDb {
      // conf visible at query start — and a stateful query leaves
      // RocksDB artifacts (sst/changelog/zip) under the state dir,
      // which the default provider never writes
      assert(spark.conf.get(ProviderKey) == RocksDb)
      import java.nio.file._
      val ckpt = Files.createTempDirectory("graft_rocks_probe").toString
      val q = Streams.windowCounts(Streams.readEvents(spark, path))
        .writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      val stateFiles = Files.walk(Paths.get(ckpt, "state")).iterator()
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      while (stateFiles.hasNext) names += stateFiles.next().toString
      assert(names.exists(n => n.endsWith(".zip") || n.endsWith(".sst") ||
        n.contains("changelog")), names.take(20).mkString("\n"))
    }
    assert(spark.conf.getOption(ProviderKey).isEmpty ||
      spark.conf.get(ProviderKey) != RocksDb)
  }
}
