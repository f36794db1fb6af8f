package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Optimization-round tooling: dump `.explain("formatted")` for named
  * queries to files (the judge checks plan claims against committed
  * plan text). Args: <sfDir> <outDir> <suffix> [comma-separated names
  * or prefixes; default = all]. Each query is MATERIALIZED through the
  * noop sink first so AQE settles, then the final executed plan plus
  * the formatted string land in `<outDir>/<name>_<suffix>.txt`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args.lift(3).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.ShuffleIo.tune(SparkSession.builder()
      .master(s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ui.retainedExecutions", "15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => names.forall(_.exists(n.startsWith)) }
      .foreach { case (name, fn) =>
        try {
          spark.catalog.clearCache()
          spark.sparkContext.setJobDescription(s"plandump: $name")
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          val qe = df.queryExecution
          val txt = qe.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted")) +
            "\n===== executedPlan (post-AQE where applicable) =====\n" +
            qe.executedPlan.toString
          Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
          System.err.println(s"[plandump] wrote $name")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
