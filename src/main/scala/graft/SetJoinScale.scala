package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness: the set-similarity family's LARGE-factor volume
  * arms (q141 PPJoin Jaccard, q162 containment) with the
  * `spark.graft.setjoin.reusePrefix` knob A/B'd at every scale — the
  * round-8 A/B measured checkpoint-once ~15% SLOWER at sf0.1 and
  * `SetJoin.scala` documents a crossover "when the prefix upstream is
  * expensive enough that 2-3 redundant full-table shuffles dominate";
  * this harness measures where (or whether) that crossover actually sits
  * on the volume axis instead of asserting it.
  *
  * Arms are the e-axis disjoint-copy blow-up from ScaleCheck: `factor`×
  * lineitem with FRESH orderkeys AND partkeys per copy, so every copy is
  * a disjoint basket+item space — no cross-copy candidate can exist
  * (no shared item), per-pair supports replicate exactly, and true-pair
  * output grows EXACTLY linearly by construction (proved empirically at
  * the 10× arm, SCALE.md round-7: 27,159 → 271,590 and 1.64M → 16.39M).
  * That makes wall-clock ratio at fixed per-pair work the honest
  * linearity probe; output rows at the 100× arm are therefore derived
  * (factor × base), not re-counted — a count() would re-execute the
  * whole multi-minute join for a value the construction fixes.
  *
  * Partition sizing tracks the factor per-directory (the ScaleCheck
  * rule: AQE initial partitions up with data, scan partition bytes
  * down), restored to base for base-dir samples in the same JVM.
  *
  * Run: `sbt "runMain graft.SetJoinScale"`; env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_SETJOIN_FACTORS (default "10,100"),
  * SPARK_GRAFT_SETJOIN_RUNS (samples per config at the largest factor,
  * default 1; smaller arms always best-of-2). Emits one JSON line per
  * (query, arm, knob) with seconds; paste results into SCALE.md.
  */
object SetJoinScale {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SETJOIN_FACTORS", "10,100")
      .split(",").map(_.trim.toInt).toSeq
    val bigRuns = sys.env.getOrElse("SPARK_GRAFT_SETJOIN_RUNS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // ScaleCheck's measurement-harness memory shape (see its scaladoc)
      .config("spark.memory.storageFraction", "0.15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val off = 100000000L
    def copies(df: DataFrame, n: Int, shift: Map[String, Long]): DataFrame =
      df.crossJoin(spark.range(n).select(col("id").as("__c")))
        .select(df.columns.map { c =>
          shift.get(c).fold(col(c))(m => (col(c) + col("__c") * m).as(c))
        }.toIndexedSeq: _*)
    val lineitem = spark.read.parquet(s"$base/lineitem.parquet")
    val dirs: Map[Int, String] = factors.filter(_ > 1).map { f =>
      val d = s"target/setjoinscale-e$f"
      // reuse a dir a previous invocation already wrote (the A/B mode
      // re-runs over the same corpora)
      if (!new java.io.File(s"$d/lineitem.parquet/_SUCCESS").exists())
        copies(lineitem, f, Map("l_orderkey" -> off, "l_partkey" -> off))
          .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
      f -> d
    }.toMap

    // per-directory partition sizing, the ScaleCheck rule
    def sizeFor(factor: Int): Unit = {
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.min(1024, cpus.toInt * factor))
      spark.conf.set("spark.sql.files.maxPartitionBytes",
        math.max(4L << 20, (128L << 20) / factor).toString)
    }
    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val qs = Seq("q141_basket_jaccard", "q162_basket_containment")
    def timeOne(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(q)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    def sample(q: String, dir: String, runs: Int): Double =
      (1 to runs).map(_ => timeOne(q, dir)).min

    qs.foreach(timeOne(_, base)) // warmup: JIT + parquet footers

    if (sys.env.getOrElse("SPARK_GRAFT_SETJOIN_MODE", "ratio") == "ab") {
      // tide-robust knob A/B: ALTERNATE off/on samples back-to-back per
      // factor so a drifting host load cancels to first order (the ratio
      // mode's blocked off-then-on layout confounds a ~20% tide swing
      // with the knob — observed via q162, whose delta is pure noise
      // because the knob only exists on the jaccard candidate stage)
      val rounds = sys.env.getOrElse("SPARK_GRAFT_SETJOIN_AB_ROUNDS", "3").toInt
      val q = "q141_basket_jaccard"
      for (f <- factors) {
        sizeFor(f)
        val d = if (f == 1) base else dirs(f)
        val samples = (1 to rounds).flatMap { r =>
          Seq(false, true).map { reuse =>
            spark.conf.set("spark.graft.setjoin.reusePrefix", reuse.toString)
            val sec = timeOne(q, d)
            println(f"""{"query":"$q%s","factor":$f%d,"reusePrefix":$reuse%s,"sec":$sec%.2f,"round":$r%d}""")
            (reuse, sec)
          }
        }
        def best(reuse: Boolean) =
          samples.collect { case (`reuse`, s) => s }.min
        println(f"""{"ab":"$q%s","factor":$f%d,"off_best":${best(false)}%.2f,"on_best":${best(true)}%.2f,"on_over_off":${best(true) / best(false)}%.3f}""")
      }
      spark.conf.set("spark.graft.setjoin.reusePrefix", "false")
      spark.stop(); return
    }

    val maxFactor = factors.max
    for (f <- Seq(1) ++ factors; reuse <- Seq(false, true); q <- qs) {
      val dir = if (f == 1) base else dirs(f)
      sizeFor(f)
      spark.conf.set("spark.graft.setjoin.reusePrefix", reuse.toString)
      // the knob is a no-op for q162 (containment has no duplicated
      // prefix upstream) — its on/off delta doubles as the ambient-noise
      // yardstick for the window
      val runs = if (f == maxFactor && f > 10) bigRuns else 2
      val sec = sample(q, dir, runs)
      println(f"""{"query":"$q%s","factor":$f%d,"reusePrefix":$reuse%s,"sec":$sec%.2f,"runs":$runs%d}""")
    }
    spark.conf.set("spark.graft.setjoin.reusePrefix", "false")
    spark.stop()
  }
}
