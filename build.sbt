ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "antimoneylaunderingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// run in-process: sbt's forked bgRun measurably stalls Spark executor
// threads (3x slower bench totals even with identical JVM flags); the
// launcher JVM already has the JDK17 add-opens and a right-sized heap
run / fork := false
// inherit stdout/stderr directly: sbt's default LoggedOutput strategy
// funnels every child log line through sbt's synchronized logger, which
// measurably stalls Spark's executor threads under load
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
// sbt's bgRun copies the full (multi-GB) Spark classpath into
// target/bg-jobs on every invocation — skip the copy, reference in place
bgCopyClasspath := false
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
// Heap size: measured at sf0.1, a 24g heap made the bench 6-7x SLOWER than
// 4g (312s vs 45s total — G1 old-gen bloat + Spark sizing its unified
// memory region off the max heap). Keep the heap small and fixed; override
// with SPARK_DRIVER_MEM only if a query genuinely OOMs.
val driverHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", "4g")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap", s"-Xms$driverHeap",
  // bound GC parallelism: with local[32] task threads, default G1 GC
  // thread counts oversubscribe the cores and stall whole stages
  "-XX:ParallelGCThreads=8", "-XX:ConcGCThreads=2",
)
// Test JVM heap headroom (round 12): the driver's round-11 `sbt test` run
// died with a stopped-SparkContext cascade most plausibly triggered by an
// OOM under host load — 435 suites share one 4g JVM whose storage region
// accumulates localCheckpoint blocks between suites. 6g (appended last, so
// it wins over the 4g run-path default) buys headroom without touching the
// bench JVM, whose 4g sizing is measured (see driverHeap note above).
Test / javaOptions += "-Xmx6g"
