package graft

import org.apache.spark.sql.SparkSession

/** Repo tooling (round-10 verdict #7): PER-QUERY ISOLATION PINS. The
  * driver's `BENCH_r{N}.json` rows ride the host tide (calibration drift
  * 1.4–2.1 observed across rounds), and many-tiny-job streaming queries
  * swing 3–5× with it — so cross-round, per-query regressions cannot be
  * judged from raw bench rows. This main times the most expensive contract
  * queries IN ISOLATION (fresh Bench-shaped session, warmup, best-of-K,
  * cache cleared between passes — the QTime discipline) and writes
  * `isolation_pins.json` at the repo root; the round's SCALE.md paragraph
  * interprets movement against the previous round's pins.
  *
  * Usage: `sbt "runMain graft.IsolationPins [queryName ...]"`; env
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), `SPARK_GRAFT_PIN_PASSES`
  * (default 3). The default list is the bench tail's top cost centers —
  * refresh it when the tail changes. */
object IsolationPins {
  private val DefaultPins = Seq(
    "q181_stream_neardup_sink", "q162_basket_containment",
    "q178_stream_cc_restart", "q182_stream_attribution",
    "q177_stream_incremental_cc", "q156_louvain_full", "q60_scc",
    "q94_text_dedup_clusters", "q48_incremental_cc", "q91_minhash_chained",
    "q141_basket_jaccard", "q106_table_stats",
    // round-11 contract rows with real machinery cost (restart lifecycles,
    // session-window state, the mirror-mode fold, the two-stream outer
    // join) — pinned from birth
    "q187_stream_session_window", "q191_stream_late_drop",
    "q192_stream_cc_delta_restart", "q193_stream_agg_restart_rocksdb",
    "q197_stream_attribution_fullouter")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PIN_PASSES", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else DefaultPins
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // warmup pass (JIT + parquet footers) on the first pin
    try once(names.head) catch { case _: Throwable => () }
    val pins = names.map { n =>
      val best = (1 to passes).map(_ => once(n)).min
      println(f"PIN $n%s best_of_$passes%d=$best%.3f")
      n -> best
    }
    val sf = dir.split("/").last
    val json = pins.map { case (n, b) => f""""$n%s": $b%.3f""" }
      .mkString(
        s"""{"sf_dir": "$sf", "passes": $passes, "pins_sec": {""", ", ", "}}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("isolation_pins.json"), json)
    println(s"wrote isolation_pins.json (${pins.size} pins, $sf, best-of-$passes)")
    spark.stop()
  }
}
