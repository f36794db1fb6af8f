package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query executes through the `noop` sink — a plain count()
  * would let Catalyst prune the aggregate/projection work and
  * under-report. For the per-query medians, caches are cleared
  * between reps so operators that legitimately self-cache (dedup
  * signature indexes, shared profiler samples) pay their own
  * materialization cost rather than a predecessor's — every timed
  * rep is a full cold execution of that operator.
  *
  * Honesty signals ride along, enough to adjudicate a disturbed
  * capture from the JSON alone (the round-6 driver capture doubled
  * mid-run and took a judge rerun to attribute):
  * - `loadavg_start`/`loadavg_end` (1-min /proc/loadavg) and a
  *   per-query `queries_min` map next to the medians: load ≫ cpus
  *   and min ≪ median = a contended box, not a regression.
  * - `queries_reps_wall` / `queries_reps_cpu` (full line only):
  *   every rep's raw wall seconds and the JVM's process-CPU-time
  *   delta over that rep, in execution order. External disturbance
  *   has a signature no summary stat can fake: wall balloons on
  *   some reps while that rep's CPU seconds stay at the query's
  *   normal burn (the box was busy, not the engine); a true
  *   regression raises wall AND cpu on every rep. One known
  *   confounder: process CPU time includes GC threads, so a
  *   periodic concurrent GC cycle (see the cleaner config below)
  *   overlapping a SHORT query's reps inflates wall and cpu
  *   together — distinguish from a real regression by rerunning
  *   that query alone (SPARK_GRAFT_BENCH_FILTER) before acting.
  * - `total_cpu_med`: Σ over queries of the CPU seconds of each
  *   query's median-wall rep — the summary-line scalar twin of the
  *   per-rep maps (wall total up, cpu total flat ⇒ external).
  * - `steal_sec`: hypervisor CPU-steal seconds across the whole run
  *   (/proc/stat). Loadavg only sees THIS VM's run queue; a noisy
  *   host neighbor inflates wall (and, via cache thrash, cpu) while
  *   loadavg reads idle — observed as a loadavg-0.36 capture with
  *   100+ stolen seconds and 3× spikes on deterministic queries.
  *   High steal ⇒ rerun before reading any per-query delta.
  * - `canary_sec` / `canary_end_sec`: median of a fixed-cost 1-row
  *   noop-sink query timed before and after the median phase — the
  *   constant per-query harness overhead, separable from engine
  *   cost. A uniform drift across unrelated queries with a flat
  *   canary is engine/session-wide; a drifting canary pins it on
  *   harness/GC/host overhead.
  * - `suite_sec`: ONE sequential pass over the whole suite with
  *   caches retained — the pipeline-shaped total where shared
  *   derived frames ([[graft.core.PlanCache]]: dedup's postings
  *   pair set, the profiler's bottom-k sample) are paid once and
  *   reused. This is how the engine actually runs a query batch;
  *   the per-query-median `value` deliberately excludes that
  *   sharing, so the pair is the measured cost/benefit of reuse.
  *
  * SPARK_GRAFT_BENCH_FILTER (local iteration only — the driver
  * never sets it): comma-separated name prefixes; only matching
  * queries run. The JSON still parses but is a partial surface —
  * n_ok says how partial.
  */
object Bench {
  private def loadavg1(): String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0)
    catch { case _: Throwable => "-1" }

  /** Cumulative hypervisor CPU-steal jiffies (/proc/stat cpu col 8,
    * USER_HZ = 100); -1 off-Linux. Loadavg only sees THIS VM's run
    * queue — a noisy host neighbor inflates wall times while loadavg
    * reads idle, and the steal delta is the only forensic that
    * catches it (observed: a loadavg-0.36 capture with 100+ stolen
    * CPU-seconds and 3× spikes on deterministic queries). */
  private def stealJiffies(): Long =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
      .linesIterator.next().trim.split("\\s+")(8).toLong
    catch { case _: Throwable => -1L }

  /** Cumulative process CPU time (user+sys, all threads), ns; -1 if
    * the platform bean doesn't expose it. */
  private def processCpuNs(): Long =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean => os.getProcessCpuTime
      case _ => -1L
    }

  /** One query's timed reps: (wall sec, cpu sec) in execution order,
    * plus the derived stats the headline uses. */
  private case class QTimes(reps: Array[(Double, Double)]) {
    private val byWall = reps.sortBy(_._1)
    def median: Double = byWall(byWall.length / 2)._1
    def min: Double = byWall.head._1
    /** CPU seconds of the median-wall rep. */
    def medianCpu: Double = byWall(byWall.length / 2)._2
    def failed: Boolean = reps.isEmpty
  }
  private val Failed = QTimes(Array.empty)

  /** Fixed-cost canary: a 1-row scan through the identical noop-sink
    * path the real queries use. Its cost is pure per-query harness
    * overhead — job scheduling, codegen dispatch, noop commit — and
    * is independent of SF and of every operator. Timed at the start
    * and again at the end of the median phase, it separates constant
    * per-query overhead from engine cost in the JSON: a uniform
    * +Δ across 133 unrelated queries with a flat canary is engine-
    * or-session-wide; a canary that drifts with them is harness/GC/
    * host overhead, not any operator's regression (the exact
    * ambiguity that made the r8 comparable-set drift unadjudicable). */
  private def canaryMedian(spark: SparkSession, reps: Int): Double = {
    import spark.implicits._
    def once(): Double = {
      val t0 = System.nanoTime()
      Seq(1L).toDF("x").write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm untimed, same discipline as the real queries
    Array.fill(math.max(reps, 3))(once()).sorted.apply(math.max(reps, 3) / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.ShuffleIo.tune(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive parquet timestamps read as LTZ (pre-Spark-4 behavior):
      // the driver's testdata encodes ts/o_orderdate/l_shipdate as
      // timestamp[us] without a zone, and the UTC session makes the
      // LTZ reading value-identical to DuckDB's naive interpretation
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // Long-run block hygiene. localCheckpoint blocks (every iterative
      // loop's lineage truncation) are freed by ContextCleaner only
      // after a GC drops their RDD references into its queue — and on a
      // 24g heap that never fills, the only guaranteed GC is Spark's
      // periodic one, whose DEFAULT interval (30min) is close to a full
      // 133-query × 3-rep run. Measured effect of the backlog: the
      // cache-retained suite pass after the ~35-min median phase ran
      // 193 s with q1_agg at 9.9 s, vs 114 s / sub-second q1_agg on a
      // fresh JVM — same code, same box. A 2-minute cadence bounds the
      // block pile-up; ExplicitGCInvokesConcurrent (build.sbt) keeps
      // each cycle concurrent instead of a stop-the-world Full GC
      // inside someone's timed rep.
      .config("spark.cleaner.periodicGC.interval", "2min")
      // the SQL status store retains up to 1000 executions' plan
      // graphs even with the UI disabled — a multi-rep 133-query run
      // holds every one of them on the heap
      .config("spark.sql.ui.retainedExecutions", "15")
      .config("spark.ui.retainedJobs", "200")
      .config("spark.ui.retainedStages", "200")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time session/codegen warmup outside the per-query timings
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val filter = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val loadStart = loadavg1()
    val stealStart = stealJiffies()
    val canaryStart = canaryMedian(spark, reps)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        filter.forall(_.exists(name.startsWith)) }
    if (selected.isEmpty) {
      // an empty or typo'd filter must not print an instant-pass
      // {"value":0.000,"n_ok":0} bench with a zero exit
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_FILTER=" +
        s"${sys.env.get("SPARK_GRAFT_BENCH_FILTER")} matches no query")
      spark.stop()
      sys.exit(1)
    }
    val results = selected.map { case (name, fn) =>
      // Median-of-N steady-state timing: first execution pays one-time
      // codegen compilation (amortized to ~0 on a real cluster run), so
      // warm up untimed, then time `reps` fresh executions with caches
      // dropped and take the median — single-shot timings on this box
      // swing up to 3× run-to-run (GC, JIT recompiles, noisy neighbors),
      // which made round-over-round per-query comparison unattributable.
      // min rides along: median ≫ min across many queries = a loaded
      // box, not a regression.
      try {
        spark.catalog.clearCache()
        run(fn)
        name -> QTimes(Array.fill(reps) {
          spark.catalog.clearCache()
          val c0 = processCpuNs()
          val t0 = System.nanoTime()
          run(fn)
          val wall = (System.nanoTime() - t0) / 1e9
          val c1 = processCpuNs()
          (wall, if (c0 < 0 || c1 < 0) -1.0 else (c1 - c0) / 1e9)
        })
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        name -> Failed
      }
    }
    // canary rerun AFTER the median phase: start-vs-end drift measures
    // how much constant per-query overhead the long run itself accretes
    // (GC pressure, status-store growth, host noise ramping mid-run)
    val canaryEnd = canaryMedian(spark, reps)
    // crash-safety checkpoint: the per-query medians are the judged
    // headline, so they land on disk BEFORE the (minutes-long) suite
    // pass — a harness timeout mid-suite then truncates the honesty
    // extras, not the round's bench (the r3 parsed:null class)
    writeAndPrint(results, Nil, -1.0, loadStart, loadavg1(), stealStart,
      canaryStart, canaryEnd, sfDir, reps, filter, printToStdout = false)
    // pipeline-shaped suite pass: cold caches at the start, retained
    // across queries so PlanCache-shared frames are built once
    spark.catalog.clearCache()
    val suiteT0 = System.nanoTime()
    val suiteTimes = results.map { case (name, qt) =>
      if (!qt.failed) {
        val t0 = System.nanoTime()
        try { run(SparkEntry.queries(name))
          name -> (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          // -1 marker, same as the medians: a partial execution's
          // elapsed time is NOT that query's pipeline cost, and an
          // unmarked failure would read as a (fast!) success
          System.err.println(s"[bench] suite $name failed: ${e.getMessage}")
          name -> -1.0
        }
      } else name -> -1.0
    }
    val suiteSec = (System.nanoTime() - suiteT0) / 1e9
    writeAndPrint(results, suiteTimes, suiteSec, loadStart, loadavg1(),
      stealStart, canaryStart, canaryEnd, sfDir, reps, filter,
      printToStdout = true)
    spark.stop()
    // A query that passed its timed reps but broke during the
    // cache-retained suite pass (a PlanCache-interaction-only failure)
    // must also fail the gate — queries_suite records -1 for it, and a
    // zero exit would let that class ship unnoticed.
    if (results.exists(_._2.failed) || suiteTimes.exists(_._2 < 0)) sys.exit(1)
  }

  /** Assemble + write the bench JSON (and optionally print it). Called
    * twice: a silent checkpoint write right after the medians (so a
    * harness timeout mid-suite-pass can't lose the round's headline),
    * then the full write with the suite fields. */
  private def writeAndPrint(results: Seq[(String, QTimes)],
      suiteTimes: Seq[(String, Double)], suiteSec: Double,
      loadStart: String, loadEnd: String, stealStart: Long,
      canaryStart: Double, canaryEnd: Double,
      sfDir: String, reps: Int,
      filter: Option[Seq[String]], printToStdout: Boolean): Unit = {
    // Locale.ROOT: a comma decimal separator would corrupt the JSON
    def r3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def qmap(failedRepr: String)(f: QTimes => String): String =
      results.map { case (k, qt) =>
        "\"" + k + "\":" + (if (qt.failed) failedRepr else f(qt)) }
        .mkString("{", ",", "}")
    val qs = qmap("-1.000")(qt => r3(qt.median))
    val qsMin = qmap("-1.000")(qt => r3(qt.min))
    // per-rep raw walls and cpu-time deltas, execution order — the
    // full-line-only forensics maps (see the scaladoc's honesty
    // list). Failed queries render as [] so the map stays homogeneous
    // (every value an array) for tools iterating the rep lists.
    val qsRepsWall = qmap("[]")(_.reps.map(r => r3(r._1)).mkString("[", ",", "]"))
    val qsRepsCpu = qmap("[]")(_.reps.map(r => r3(r._2)).mkString("[", ",", "]"))
    // suite fields only once the suite pass actually ran. The scalar
    // (suite_sec) and the per-query map are kept SEPARATE: the map goes
    // only into the full line/file, never the summary — in round 5 the
    // map rode into the summary via the honesty suffix and re-broke the
    // driver's bounded tail capture (the exact r3 parsed:null class).
    val suiteScalar = if (suiteSec < 0) "" else s""""suite_sec":${r3(suiteSec)},"""
    val suiteMap = if (suiteSec < 0) "" else {
      val qsSuite = suiteTimes.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
      s""""queries_suite":$qsSuite,"""
    }
    // failures are excluded from the headline total (a -1 marker would
    // make a broken run look FASTER) and reported explicitly
    val ok = results.filter(!_._2.failed)
    val failed = results.filter(_._2.failed).map(_._1)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r3(ok.map(_._2.median).sum)
    val totalMin = r3(ok.map(_._2.min).sum)
    // -1 marker (not a sum of per-query -1 sentinels) when the JVM
    // doesn't expose process CPU time — a negative garbage total
    // would silently compare against real totals across rounds
    val totalCpuMed =
      if (ok.exists(_._2.medianCpu < 0)) "-1.000"
      else r3(ok.map(_._2.medianCpu).sum)
    // scalars only — safe to embed in the bounded-size summary line.
    // total_min leads: it is the contention-robust stat (an external
    // disturbance inflates the median long before the min), so a
    // reader hits it before the per-query maps.
    // a filtered run is a PARTIAL surface: stamp the filter into every
    // JSON line so a partial total can never masquerade as the full
    // record in cross-round comparison
    val filterField =
      filter.map(f => s""""filter":"${f.mkString(",")}",""").getOrElse("")
    // hypervisor steal across the whole run, seconds (USER_HZ = 100);
    // -1 when /proc/stat is unreadable at either end
    val stealNow = stealJiffies()
    val stealSec =
      if (stealStart < 0 || stealNow < 0) "-1.000"
      else r3((stealNow - stealStart) / 100.0)
    val honesty =
      filterField +
        s""""total_min":$totalMin,"total_cpu_med":$totalCpuMed,$suiteScalar""" +
        s""""loadavg_start":$loadStart,"loadavg_end":$loadEnd,""" +
        s""""canary_sec":${r3(canaryStart)},"canary_end_sec":${r3(canaryEnd)},""" +
        s""""steal_sec":$stealSec"""
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""queries_min":$qsMin,"queries_reps_wall":$qsRepsWall,""" +
        s""""queries_reps_cpu":$qsRepsCpu,$suiteMap""" +
        s""""sf":"$sfDir","reps":$reps,"n_ok":${ok.size},"n_failed":${failed.size},""" +
        s""""failed":$failedJson,$honesty}"""
    // Compact summary WITHOUT any per-query map, printed LAST: the full
    // line grew to ~4.6 KB at 92 queries and the driver's bounded tail
    // capture truncated its head (BENCH_r03 parsed:null; BENCH_r05
    // repeated it when queries_suite leaked into this line). The last
    // line must stay a few hundred bytes and self-sufficient to parse.
    val summary =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir",""" +
        s""""reps":$reps,"n_ok":${ok.size},"n_failed":${failed.size},""" +
        s""""failed":$failedJson,$honesty}"""
    // machine-readable copy — sbt log noise around stdout made the
    // driver's parse fall back to log-fishing in round 1. A filtered
    // (partial-surface) run never overwrites the default full-surface
    // record: it lands in bench_out.partial.json unless the caller
    // explicitly chose an output path.
    val defaultOut =
      if (filter.isDefined) "bench_out.partial.json" else "bench_out.json"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    if (printToStdout) { println(json); println(summary) }
  }
}
