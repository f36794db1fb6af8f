ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreduceframeworkapispark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked JVM's stdout through verbatim instead of routing it
// through sbt's logger: the logger prefixes every line with "[info] ",
// which breaks machine parsing of Bench's single JSON output line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 24g default on the 128 GiB box: the bench/verify JVM runs 32
  // executor threads plus cached shared frames, and 8g left G1
  // collecting through the cache-heavy suite pass. A/B note: bench
  // totals on this box swing ±9% run-to-run at IDENTICAL code+config
  // (loadavg honesty fields exist for exactly this), so the total
  // delta is inside noise; 24g+G1 is kept for its best-observed run
  // and the tightest spread on the iterative driver-loop queries
  // (ParallelGC was bimodal there — components 3.8↔7.4 s — and the
  // driver flags >2× per-query swings as regressions).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Spark's ContextCleaner calls System.gc() on its periodic cadence
  // (see Bench/Verify's spark.cleaner.periodicGC.interval) to flush
  // dropped RDD/broadcast references into its cleanup queue; without
  // this flag each of those is a stop-the-world Full GC that can land
  // inside a timed rep — with it, G1 runs a concurrent cycle instead.
  "-XX:+ExplicitGCInvokesConcurrent",
)
