package graft

import org.apache.spark.sql.SparkSession

/** Repo tooling: time one or more registered queries best-of-N under the
  * exact Bench session config (noop sink, warmup, cache clear between
  * runs). Usage: `sbt "runMain graft.QTime q141_basket_jaccard q60_scc"`;
  * env `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` / `SPARK_GRAFT_BENCH_PASSES`
  * as in [[Bench]]. */
object QTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def materialize(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    val names = if (args.nonEmpty) args.toSeq else Seq("q01_global_agg")
    // warmup on the first target itself (JIT + parquet footers)
    try materialize(names.head) catch { case _: Throwable => () }
    for (name <- names) {
      val ts = (1 to passes).map(_ => materialize(name))
      println(f"QTIME $name best=${ts.min}%.3f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
