package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.er.Blocking

/** ER-blocking scale harness — the 100× datapoint for the one
  * quadratic-per-block candidate generator in the engine
  * ([[graft.er.Blocking.rulePairs]]): same-entity densification makes a
  * block of size c emit ~c²/2 pairs, so unlike every other headline family
  * the cost is NOT bounded by the data volume. Three arms over the q21
  * dedupe fixture (`ErQueries.dirty`) and the q46 txn fixture:
  *
  *  - `base`     — sf0.1 as-is.
  *  - `skewF`    — 1% of customers cloned `factor`× (offset custkey, same
  *                 attributes): the REAL shape of blocking skew (a few
  *                 hyper-dense values, everything else untouched). Times
  *                 UNCAPPED pair generation (super-linear growth measured)
  *                 and CAPPED ([[graft.er.ErSettings.maxBlockSize]]) —
  *                 purge should restore ~data-linear cost.
  *  - `uniF`     — ALL customers cloned `factor`× (the q16/q60-style
  *                 uniform axis): every block densifies by `factor`, pair
  *                 volume grows `factor²`. Telemetry ONLY
  *                 ([[Blocking.blockStats]] predicts the pair count from
  *                 per-block counts without generating pairs — the whole
  *                 point of the pre-flight) plus a capped timing: at this
  *                 density every block exceeds any sane cap, so the capped
  *                 run measures that purge keeps even the pathological
  *                 corpus BOUNDED (count-window cost, zero pairs out).
  *
  * The txn fixture gets base + `factor`× orders (the e-axis: same
  * customers, same odate/amount cells → uniform densification of both q46
  * rules) — telemetry + capped timing, same rationale as `uniF`.
  *
  * Run: `sbt "runMain graft.ErScale"`; env SPARK_GRAFT_SCALE_FACTOR
  * (default 100), SPARK_GRAFT_ER_CAP (default 32), SPARK_GRAFT_SF_DIR.
  * Results recorded in SCALE.md.
  */
object ErScale {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "100").toInt
    val cap = sys.env.getOrElse("SPARK_GRAFT_ER_CAP", "32").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // measurement-harness policy from ScaleCheck: partition count tracks
      // the data factor, storage pool shrunk for checkpoint-heavy jobs
      .config("spark.memory.storageFraction", "0.15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      math.min(1024, cpus.toInt * factor))
    spark.conf.set("spark.sql.files.maxPartitionBytes",
      math.max(4L << 20, (128L << 20) / factor).toString)

    val off = 100000000L
    // `from = 1` for union arms: every clone shifts by ≥ off so no clone
    // keeps the original's key (a __c=0 clone unioned with the base would
    // duplicate unique_ids, and the l.uid < r.uid pair dedup would then
    // collapse some pairs, skewing the measured densification)
    def copies(df: DataFrame, n: Int, shift: Map[String, Long],
        from: Int = 0): DataFrame =
      df.crossJoin(spark.range(from, from + n).select(col("id").as("__c")))
        .select(df.columns.map { c =>
          shift.get(c).fold(col(c))(m => (col(c) + col("__c") * m).as(c))
        }.toIndexedSeq: _*)

    val customer = spark.read.parquet(s"$base/customer.parquet")
    val orders = spark.read.parquet(s"$base/orders.parquet")
    val nation = spark.read.parquet(s"$base/nation.parquet")
    val out = "target/erscale"
    // skew arm: base customers + factor× clones of the 1% sample — the
    // clones share every blocking attribute with their original, so its
    // blocks densify by ~factor while the other 99% stay base-sized
    val skewDir = s"$out-skew$factor"
    customer.unionAll(
        copies(customer.where(col("c_custkey") % 100 === 0), factor,
          Map("c_custkey" -> off), from = 1))
      .write.mode("overwrite").parquet(s"$skewDir/customer.parquet")
    // uniform arm: every customer cloned factor× (ScaleCheck's v-axis)
    val uniDir = s"$out-uni$factor"
    copies(customer, factor, Map("c_custkey" -> off))
      .write.mode("overwrite").parquet(s"$uniDir/customer.parquet")
    // txn e-axis: factor× orders (fresh orderkeys, same customers/dates)
    val eDir = s"$out-e$factor"
    copies(orders, factor, Map("o_orderkey" -> off))
      .write.mode("overwrite").parquet(s"$eDir/orders.parquet")
    customer.write.mode("overwrite").parquet(s"$eDir/customer.parquet")
    Seq(skewDir, uniDir).foreach { d =>
      orders.write.mode("overwrite").parquet(s"$d/orders.parquet")
      nation.write.mode("overwrite").parquet(s"$d/nation.parquet")
    }
    nation.write.mode("overwrite").parquet(s"$eDir/nation.parquet")

    def materialize(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def stats(tag: String, df: DataFrame, st: graft.er.ErSettings): Unit =
      Blocking.blockStats(df, st).orderBy("rule_idx")
        .collect().foreach { r =>
          println(s"""{"arm":"$tag","rule":${r.getLong(0)},"n_blocks":${r.getLong(1)},""" +
            s""""max_block":${r.getLong(2)},"p99_block":${r.getDouble(3)},""" +
            s""""cand_pairs":${r.getLong(4)}}""")
        }

    import graft.queries.ErQueries
    val dedupe = ErQueries.settings
    val capped = dedupe.copy(maxBlockSize = Some(cap))
    def dirty(d: String) = ErQueries.dirty(spark, d)
    // warmup (JIT + parquet footers)
    materialize(Blocking.pairs(dirty(base), dedupe))

    for ((tag, dir) <- Seq("base" -> base, s"skew$factor" -> skewDir)) {
      stats(tag, dirty(dir), dedupe)
      val tUn = time(materialize(Blocking.pairs(dirty(dir), dedupe)))
      val tCap = time(materialize(Blocking.pairs(dirty(dir), capped)))
      val nUn = Blocking.pairs(dirty(dir), dedupe).count()
      val nCap = Blocking.pairs(dirty(dir), capped).count()
      println(f"""{"arm":"$tag%s","uncapped_sec":$tUn%.2f,"capped_sec":$tCap%.2f,"cap":$cap%d,"uncapped_pairs":$nUn%d,"capped_pairs":$nCap%d}""")
    }
    // uniform arm: telemetry predicts the quadratic pair count; only the
    // capped generation is actually run (bounded by construction)
    stats(s"uni$factor", dirty(uniDir), dedupe)
    val tUniCap = time(materialize(Blocking.pairs(dirty(uniDir), capped)))
    println(f"""{"arm":"uni$factor%d","capped_sec":$tUniCap%.2f,"cap":$cap%d}""")

    // txn-shaped pass at the e-axis: telemetry + capped timing
    val txn = (d: String) => graft.queries.ErQueries.txnEntities(spark, d)
    val txnSt = graft.queries.ErQueries.txnSettings
    stats("txn_base", txn(base), txnSt)
    stats(s"txn_e$factor", txn(eDir), txnSt)
    val tTxnCap = time(materialize(
      Blocking.pairs(txn(eDir), txnSt.copy(maxBlockSize = Some(cap)))))
    println(f"""{"arm":"txn_e$factor%d","capped_sec":$tTxnCap%.2f,"cap":$cap%d}""")
    spark.stop()
  }
}
