package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for unit specs. Suites run in one forked JVM
  * (build.sbt `Test / fork := true`), so one session serves the whole run.
  *
  * Hardened (round 12): the driver's round-11 `sbt test` run went red with a
  * stopped-SparkContext cascade — one fatal error (OOM under host load)
  * killed the shared context and every later suite's `lazy val` kept handing
  * out the dead session. The accessor now goes through [[SparkTestBase.session]],
  * which rebuilds the session when the cached context is stopped (including
  * the mid-stop race where `getOrCreate` still returns the dying context).
  */
trait SparkTestBase extends AnyFunSuite {
  // lazy val (not def): `import spark.implicits._` needs a stable
  // identifier. Each suite instance is constructed fresh, so the rebuild
  // check in [[SparkTestBase.session]] still runs once per suite.
  lazy val spark: SparkSession = SparkTestBase.session
}

object SparkTestBase {
  private def build(): SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // testdata events.parquet carries TIMESTAMP(NANOS) — see Tables.load
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()

  def session: SparkSession = synchronized {
    var s = build() // getOrCreate: reuses the live session when one exists
    if (s.sparkContext.isStopped) {
      // a previous suite's fatal error stopped the context; getOrCreate can
      // still return it mid-stop (active-context clearing races the stop).
      // Clear the cached session handles and retry until a live context
      // comes back — bounded, so a hard failure still surfaces.
      var tries = 0
      while (s.sparkContext.isStopped && tries < 10) {
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        Thread.sleep(500)
        s = build()
        tries += 1
      }
    }
    s
  }
}
