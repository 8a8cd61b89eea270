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
    // args: query names, plus optional `conf:key=value[,key=value...]`
    // A/B arms — each named arm re-times every query under those confs in
    // the same JVM (interleaved with the default arm's passes)
    val (confArgs, names0) = args.toSeq.partition(_.startsWith("conf:"))
    val names = if (names0.nonEmpty) names0 else Seq("q01_global_agg")
    val arms: Seq[(String, Map[String, String])] =
      ("default" -> Map.empty[String, String]) +: confArgs.map { a =>
        val kvs = a.stripPrefix("conf:").split(",").map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
        a.stripPrefix("conf:") -> kvs
      }
    // warmup on the first target itself (JIT + parquet footers)
    try materialize(names.head) catch { case _: Throwable => () }
    for (name <- names) {
      // interleave arm passes (A,B,A,B,…) so JIT/ambient drift lands on
      // both arms equally — block-ordered arms systematically favored the
      // later arm by a full warmup tier
      val ts: Seq[(String, Double)] = (1 to passes).flatMap { _ =>
        arms.map { case (armName, confs) =>
          // restore the PRE-ARM session value, not the engine default:
          // unset would drop builder-set keys (e.g. shuffle.partitions=cpus)
          // and silently change the default arm's baseline mid-run
          val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
          confs.foreach { case (k, v) => spark.conf.set(k, v) }
          val t = materialize(name)
          saved.foreach {
            case (k, Some(v)) => spark.conf.set(k, v)
            case (k, None) => spark.conf.unset(k)
          }
          armName -> t
        }
      }
      for ((armName, _) <- arms) {
        val mine = ts.filter(_._1 == armName).map(_._2)
        val tag = if (arms.size > 1) s" arm=$armName" else ""
        println(f"QTIME $name$tag best=${mine.min}%.3f all=${mine.map(t => f"$t%.2f").mkString(",")}")
      }
    }
    spark.stop()
  }
}
