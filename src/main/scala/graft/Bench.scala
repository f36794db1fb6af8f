package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query executes through the `noop` sink — a plain count()
  * would let Catalyst prune the aggregate/projection work and
  * under-report. Caches are cleared between queries so operators that
  * legitimately self-cache (dedup signature indexes) pay their own
  * materialization cost rather than a predecessor's.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session/codegen warmup outside the per-query timings
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // steady-state timing: first execution pays one-time codegen
      // compilation (amortized to ~0 on a real cluster run), so warm
      // up untimed, then time a fresh execution with caches dropped.
      try {
        spark.catalog.clearCache()
        run(fn)
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run(fn)
        name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures are excluded from the headline total (a -1 marker would
    // make a broken run look FASTER) and reported explicitly
    val ok = results.filter(_._2 >= 0)
    val failed = results.filter(_._2 < 0).map(_._1)
    val total = ok.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","n_ok":${ok.size},"n_failed":${failed.size},""" +
        s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")}}"""
    // machine-readable copy — sbt log noise around stdout made the
    // driver's parse fall back to log-fishing in round 1
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
