package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for unit specs. Suites run in one forked JVM
  * (build.sbt `Test / fork := true`), so the session is created once via
  * getOrCreate and never stopped mid-run. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // testdata events.parquet carries TIMESTAMP(NANOS) — see Tables.load
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
}
