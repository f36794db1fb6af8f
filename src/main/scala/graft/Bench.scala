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
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Median-of-N steady-state timing: first execution pays one-time
      // codegen compilation (amortized to ~0 on a real cluster run), so
      // warm up untimed, then time `reps` fresh executions with caches
      // dropped and take the median — single-shot timings on this box
      // swing up to 3× run-to-run (GC, JIT recompiles, noisy neighbors),
      // which made round-over-round per-query comparison unattributable.
      try {
        spark.catalog.clearCache()
        run(fn)
        val times = Array.fill(reps) {
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          run(fn)
          (System.nanoTime() - t0) / 1e9
        }.sorted
        name -> times(times.length / 2)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> -1.0
      }
    }
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // failures are excluded from the headline total (a -1 marker would
    // make a broken run look FASTER) and reported explicitly
    val ok = results.filter(_._2 >= 0)
    val failed = results.filter(_._2 < 0).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r3(ok.map(_._2).sum)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","reps":$reps,"n_ok":${ok.size},"n_failed":${failed.size},""" +
        s""""failed":$failedJson}"""
    // Compact summary WITHOUT the per-query map, printed LAST: the full
    // line grew to ~4.6 KB at 92 queries and the driver's bounded tail
    // capture truncated its head (BENCH_r03 parsed:null). The last line
    // always fits the tail window and is self-sufficient to parse.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""reps":$reps,"n_ok":${ok.size},"n_failed":${failed.size},"failed":$failedJson}"""
    // machine-readable copy — sbt log noise around stdout made the
    // driver's parse fall back to log-fishing in round 1
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    println(summary)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
