package graft

import org.apache.spark.sql.SparkSession

/** Interleaved same-JVM A/B of the ER gamma-pass materialization on the
  * q23 workload (round-6 judge ask #2: q22/q23 ran 1.62×/1.50× their r5
  * times — above the ambient-drift band — and commit 8d052e9 rewired the
  * gamma materialization in the PIPELINE; the registered queries already
  * passed `materializePairs = true`, so this isolates whether
  * materialize-once is a win or a loss at query scale, drift-free).
  *
  * Arms: `materializePairs = true` (localCheckpoint the blocked-pair
  * gammas once; EM fit and final scoring both read the checkpoint) vs
  * `false` (each consumer re-derives the gamma pipeline — a second
  * JaroWinkler/Levenshtein pass over every blocked pair, but zero
  * checkpoint write cost). Best-of-3, arms interleaved A,B,A,B,… so JIT
  * and ambient load land on both equally (the SccAb convention).
  * Run: `sbt "runMain graft.ErAb"`; verdict row in SCALE.md. */
object ErAb {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val settings = graft.queries.ErQueries.settings
    def run(mat: Boolean): Double = {
      val t0 = System.nanoTime()
      val (scored, _) = graft.er.EntityResolver.scoredComparisons(
        graft.queries.ErQueries.dirty(spark, dir), settings,
        materializePairs = mat)
      graft.er.FellegiSunter.patternSummary(scored, settings.comparisons)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val arms = Seq(true, false)
    arms.foreach(run) // warmup both code paths
    val times = (1 to 3).flatMap(_ => arms.map(m => m -> run(m)))
    arms.foreach { m =>
      val ts = times.filter(_._1 == m).map(_._2)
      println(f"""{"materializePairs":$m%s,"best":${ts.min}%.2f,"all":[${ts.map(t => f"$t%.2f").mkString(",")}]}""")
    }
    spark.stop()
  }
}
