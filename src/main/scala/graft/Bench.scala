package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Bench {

  /** FROZEN calibration workloads — ambient-host-drift anchors.
    *
    * Round 6's bench was uniformly ~33% slower than round 5 across all 78
    * shared queries INCLUDING never-touched trivial ones — ambient host
    * load, not regression — which made raw cross-round wall-time totals
    * (and the driver's within-2×-of-baseline gate) unfalsifiable. These
    * three workloads never change: their measured time vs the pinned
    * baseline below yields a `drift_factor` that normalizes every
    * cross-round comparison. DO NOT EDIT the workload bodies — a changed
    * anchor is no anchor. Coverage: a pure columnar scan-agg (CPU +
    * parquet read), a fixed shuffle join (exchange + sort/hash), and a
    * many-tiny-jobs loop (driver scheduling floor — the q60-style cost).
    */
  private object Calibration {
    def scanAgg(spark: SparkSession, sfDir: String): DataFrame =
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum("l_quantity").as("q"), sum("l_extendedprice").as("p"),
          count(lit(1)).as("n"))
    def shuffleJoin(spark: SparkSession, sfDir: String): DataFrame = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(32, col("o_orderkey"))
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
        .repartition(32, col("l_orderkey"))
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority").agg(sum("l_quantity").as("q"))
    }
    /** 24 driver-action round-trips over trivial jobs: times the
      * scheduler, not the rows. */
    def jobLoop(spark: SparkSession): Unit = {
      var i = 0
      while (i < 24) {
        spark.range(1000L).agg(sum("id")).collect()
        i += 1
      }
    }

    /** Pinned per-workload baseline seconds (best-of-3 after warmup,
      * sf0.1, local[32], 4g heap), measured 2026-08-15 (round 7) —
      * the reference point drift_factor is computed against.
      *
      * Provenance audit 2026-08-16 (round 8, `runMain graft.Bench cal`
      * probes; full series in SCALE.md): the quietest standalone probe
      * read (0.249, 0.671, 2.098) → drift 1.056 — within ~6% of these
      * pins, so they ARE quiet-host-correct and r7's "measured in a slow
      * band" caveat was wrong; left unchanged (a <10% re-pin is inside
      * the probe noise). Two context facts for reading drift_factor:
      * the tide moves 1.05→1.45 within half an hour, and IN-BENCH
      * bracketing samples read ~1.2× above concurrent standalone probes
      * (the 174-query JVM's GC/page-cache state — shared with the
      * queries being normalized, which is exactly why the brackets
      * sample inside that JVM). So in-bench drift ≈ tide × JVM-state,
      * both of which the queries experience too. */
    val baseline: Map[String, Double] =
      Map("cal_scan" -> 0.28, "cal_join" -> 0.65, "cal_loop" -> 1.93)

    def measure(spark: SparkSession, sfDir: String,
        materialize: DataFrame => Unit): Map[String, Double] = {
      def time(body: => Unit): Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      Map(
        "cal_scan" -> time(materialize(scanAgg(spark, sfDir))),
        "cal_join" -> time(materialize(shuffleJoin(spark, sfDir))),
        "cal_loop" -> time(jobLoop(spark)))
    }
  }

  /** Repo tooling: sample the calibration anchors N times (default 3) and
    * print each sample + its drift vs the pinned baseline — the cheap
    * host-tide probe used to hunt a verified-quiet window for re-pinning
    * (SCALE.md anchor-provenance protocol) without paying a full bench.
    * Run: `sbt "runMain graft.Bench cal [n]"`. */
  private def calProbe(n: Int): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mat(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val dir = "/root/testdata/sf0.1"
    Calibration.measure(spark, dir, mat) // warmup, untimed
    val baseTot = Calibration.baseline.values.sum
    (1 to n).foreach { i =>
      val s = Calibration.measure(spark, dir, mat)
      println(f"""{"cal_sample":$i,"cal_scan":${s("cal_scan")}%.3f,"cal_join":${s("cal_join")}%.3f,"cal_loop":${s("cal_loop")}%.3f,"drift":${s.values.sum / baseTot}%.3f}""")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("cal")) {
      calProbe(args.lift(1).map(_.toInt).getOrElse(3)); return
    }
    // budget clock starts at MAIN ENTRY so session creation, warmup, and
    // anchor samples all count against the wall budget the driver enforces
    val tMain = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - tMain) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.ts encoding varies by generation — see Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // materialize via the noop sink, not count(): count() lets Catalyst
    // prune projection-only work (a translate chain under count never
    // executes), so noop-write times match the verify-path work
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // untimed warmup: JVM/codegen/parquet-footer caches, so per-query times
    // measure the queries rather than first-touch JIT
    try materialize(SparkEntry.entry(spark)) catch { case _: Throwable => () }
    // calibration anchors bracket EVERY pass (passes+1 samples): two
    // endpoint samples under-read a tide that moves mid-run (observed:
    // two back-to-back benches with raw totals 7% apart reported
    // endpoint drifts 37% apart), so each pass is normalized by the
    // average of its own bracketing samples. Anchors are pinned to the
    // sf0.1 tables whenever present (an anchor whose DATA scales with
    // the bench SF is not frozen) — only a host without that directory
    // falls back to the bench dir.
    val calDir =
      if (new java.io.File("/root/testdata/sf0.1/lineitem.parquet").exists())
        "/root/testdata/sf0.1" else sfDir
    def calSample(): Map[String, Double] =
      Calibration.measure(spark, calDir, materialize)
    // up-to-N passes, per-query best: the host has transient throttling
    // windows and pass 1 still pays residual JIT — the min is the
    // repeatable time (round-4 cross-round comparisons were polluted by
    // ambient load; best-of-3 keeps per-query values stable within ~10%)
    // floor at 1: the summary reducers need at least one completed pass
    val maxPasses =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    // Wall-budget guard (round-7 fix): BENCH_r07.json was rc=124 — the
    // driver's `timeout` killed the run mid-pass and the round had NO
    // official perf number. The bench now (a) stops adding passes once
    // elapsed + a projected next pass would cross SPARK_GRAFT_BENCH_BUDGET
    // seconds (measured from main entry — sbt compile happens before this
    // JVM reaches us, hence the conservative 900 s default), and (b)
    // emits the parseable summary line after EVERY completed pass, so
    // even a killed run leaves a valid last-line JSON in the tail. The
    // per-pass-bracketing anchor design normalizes any pass count ≥ 1.
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "900").toDouble
    // composed-pipeline row: the synthetic-identity + structuring + ER
    // stages of the reference DAG end-to-end (catalog writes included),
    // so cross-round regressions in the COMPOSITION — not just per-query
    // — show up in the bench. Runs ONCE per bench (round-7 tail trim:
    // 3 passes × ~10 s was a top budget cost and the pipeline has its own
    // crash sentinel instead of best-of-N); one retry on failure, then
    // the loud 99999 sentinel stays in the artifact — a crash should be
    // visible, not averaged away.
    def pipelinePass(): Double = {
      val whPath = java.nio.file.Files.createTempDirectory("graft_bench_wh")
      val t0 = System.nanoTime()
      val dt = try {
        val p = new graft.pipelines.AmlPipelines(spark, sfDir, whPath.toString)
        p.runSyntheticIdentity().count()
        p.runStructuring().count()
        p.runEntityResolution().count()
        (System.nanoTime() - t0) / 1e9
      } catch {
        case t: Throwable =>
          System.err.println(s"[graft-bench] pipeline_aml pass FAILED: $t")
          99999.0
      }
      spark.catalog.clearCache()
      try { // best-effort temp-warehouse cleanup (one dir of writes per pass)
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(whPath).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: Throwable => () }
      dt
    }
    def onePass(): Seq[(String, Double)] =
      SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
        val t0 = System.nanoTime()
        try materialize(fn(spark, sfDir)) catch { case _: Throwable => () }
        val dt = (System.nanoTime() - t0) / 1e9
        // drop per-query persists so cache buildup can't GC-thrash later queries
        spark.catalog.clearCache()
        name -> dt
      }

    def fmt3(v: Double) = f"$v%.3f"
    def jmap(m: Seq[(String, Double)], prec: Double => String): String =
      m.map { case (k, v) => "\"" + k + "\":" + prec(v) }
        .mkString("{", ",", "}")
    val sfLabel = new java.io.File(sfDir).getName
    val baseTot = Calibration.baseline.values.sum

    val calSamples = scala.collection.mutable.ArrayBuffer(calSample())
    val rawPasses = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    val passDur = scala.collection.mutable.ArrayBuffer.empty[Double]
    var pipelineSec = Double.NaN
    var pipelineDrift = 1.0

    /** Summary over the passes completed so far; printed after every pass
      * (driver tail-capture fail-safe) and written to bench_results.json.
      * Output framing (round-6 fix): the driver's stdout capture window is
      * ~1.5 KB of TAIL and sbt appends a [success] line after us, so the
      * full per-query map (~2.1 KB) would lose its head → `parsed: null`.
      * The stdout line carries only summary + calibration + the 12 slowest
      * queries (~0.7 KB); the FULL map goes to bench_results.json. */
    def emitSummary(): String = {
      val k = rawPasses.length
      // per-pass drift = mean of the pass's bracketing anchor totals over
      // the pinned baseline total; >1 = slower-than-reference window.
      // Clamped below at 1e-3 against a degenerate baseline edit.
      val driftPerPass = (1 to k).map { i =>
        math.max(1e-3, (calSamples(i - 1).values.sum +
          calSamples(i).values.sum) / 2.0 / baseTot)
      }
      // headline drift = the BEST bracketed window (matches the best-of-N
      // convention of the raw times); per-pass samples go to the JSON so a
      // reader can judge how steady the run was.
      val drift = driftPerPass.min
      val qResults = rawPasses.reduce { (a, b) =>
        a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) }
      }
      val results = qResults :+ ("pipeline_aml" -> pipelineSec)
      // normalized per-query best: each pass's raw time over ITS OWN
      // window's drift, then min across passes — pairs every measurement
      // with the tide reading nearest in time
      val normalized = rawPasses.toSeq.zip(driftPerPass).map { case (pass, d) =>
        pass.map { case (n, t) => n -> t / d }
      }.reduce { (a, b) =>
        a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) }
      } :+ ("pipeline_aml" -> pipelineSec / pipelineDrift)
      val cal = calSamples.reduce { (a, b) =>
        a.map { case (k, v) => k -> math.min(v, b(k)) }
      }
      val total = results.map(_._2).sum
      val totalNormalized = normalized.map(_._2).sum
      val top12 = results.sortBy(-_._2).take(12).sortBy(_._1)
      def summaryLine(queries: Seq[(String, Double)]): String =
        s"""{"metric":"total","value":${fmt3(total)},"unit":"sec"""" +
          s""","n":${results.size},"sf":"$sfLabel","passes":$k""" +
          s""","calibration":${jmap(cal.toSeq.sortBy(_._1), fmt3)}""" +
          s""","drift_factor":${fmt3(drift)}""" +
          s""","drift_per_pass":[${driftPerPass.map(fmt3).mkString(",")}]""" +
          s""","value_normalized":${fmt3(totalNormalized)}""" +
          s""","queries_file":"bench_results.json"""" +
          s""","queries":${jmap(queries, fmt3)}}"""
      try java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_results.json"),
        (summaryLine(results) + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
      summaryLine(top12)
    }

    var continue = true
    while (continue && rawPasses.length < maxPasses) {
      val t0 = System.nanoTime()
      val pass = onePass()
      if (rawPasses.isEmpty) {
        pipelineSec = pipelinePass()
        if (pipelineSec >= 99999.0) pipelineSec = pipelinePass() // one retry
      }
      calSamples += calSample()
      rawPasses += pass
      passDur += (System.nanoTime() - t0) / 1e9
      if (rawPasses.length == 1) {
        // pipeline ran inside pass 1's bracketing window
        pipelineDrift = math.max(1e-3,
          (calSamples(0).values.sum + calSamples(1).values.sum) / 2.0 / baseTot)
      }
      println(emitSummary())
      // projected next pass: the slowest query pass so far (pipeline runs
      // only once, so pass 1's duration over-projects — conservative is
      // the right direction for a kill-avoidance guard)
      if (rawPasses.length < maxPasses &&
          elapsedSec + passDur.max > budget) {
        System.err.println(f"[graft-bench] budget stop after ${rawPasses.length} passes: " +
          f"elapsed $elapsedSec%.0f s + projected ${passDur.max}%.0f s > budget $budget%.0f s")
        continue = false
      }
    }
    // full per-query lines for a human tail-reader, then the canonical
    // summary REPEATED as the very last stdout line (last-line contract)
    val finalResults = rawPasses.reduce { (a, b) =>
      a.zip(b).map { case ((n, x), (_, y)) => n -> math.min(x, y) }
    } :+ ("pipeline_aml" -> pipelineSec)
    finalResults.foreach { case (k, v) => println(f"""{"query":"$k%s","sec":$v%.3f}""") }
    println(emitSummary())
    spark.stop()
  }
}
