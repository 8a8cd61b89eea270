package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness for the durable incremental-CC sink's COMMIT LAW
  * (SCALE.md "durable-sink commit cost"): per-micro-batch wall time, split
  * by commit mode, as accumulated state grows.
  *
  * Stream shape: `batches` micro-batches of constant size — each lands
  * `perBatch` fresh vertices as 10-vertex stars plus one edge merging into
  * the previous batch's component — so per-batch FOLD work is ~constant
  * while accumulated vertices grow linearly. Exactly the regime where the
  * default full-snapshot commit (O(accumulated V) write per batch) must
  * eventually dominate the fold, and the `snapshotEvery=N` delta mode
  * (O(batch) writes, periodic snapshots) must stay flat.
  *
  * Modes timed per batch, same data: `mem` (stateDir=None — fold only, the
  * floor), `full` (snapshotEvery=1, the default), `delta`
  * (snapshotEvery=10). Commit cost = mode − mem, per batch.
  *
  * Run: `sbt "runMain graft.SinkScale"`; env SPARK_GRAFT_SINK_PER_BATCH
  * (default 100000), SPARK_GRAFT_SINK_BATCHES (default 10),
  * SPARK_GRAFT_SINK_FACTORS (default "1,10" — per-batch size multipliers,
  * so factor 10 accumulates 10× the vertices by the last batch). */
object SinkScale {
  def main(args: Array[String]): Unit = {
    val perBatch0 = sys.env.getOrElse("SPARK_GRAFT_SINK_PER_BATCH", "100000").toLong
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_SINK_BATCHES", "10").toInt
    val factors = sys.env.getOrElse("SPARK_GRAFT_SINK_FACTORS", "1,10")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.memory.storageFraction", "0.15")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Batch i: perBatch fresh vertices [i·perBatch, (i+1)·perBatch) as
      * 10-vertex stars, plus one edge chaining to batch i−1's first star. */
    def batchEdges(perBatch: Long, i: Int): DataFrame = {
      val lo = i * perBatch
      val stars = spark.range(lo, lo + perBatch)
        .select(col("id").as("src"), (col("id") - col("id") % 10).as("dst"))
        .where(col("src") =!= col("dst"))
      if (i == 0) stars
      else stars.union(spark.range(1)
        .select(lit(lo).as("src"), lit(lo - perBatch).as("dst")))
    }

    factors.foreach { f =>
      val perBatch = perBatch0 * f
      // one warmup fold so JIT/codegen caches do not bill to mode "mem"
      new graft.streaming.Streams.IncrementalCCSink()
        .update(batchEdges(perBatch, 0), 0L)
      val modes: Seq[(String, Option[String], Int)] = Seq(
        ("mem", None, 1),
        ("full", Some(java.nio.file.Files
          .createTempDirectory("sinkscale_full_").toString), 1),
        ("delta", Some(java.nio.file.Files
          .createTempDirectory("sinkscale_delta_").toString), 10))
      val perMode = modes.map { case (mode, stateDir, snapEvery) =>
        val sink = new graft.streaming.Streams.IncrementalCCSink(
          stateDir = stateDir, snapshotEvery = snapEvery)
        val times = (0 until nBatches).map { i =>
          val e = batchEdges(perBatch, i).localCheckpoint() // source cost off the clock
          val t0 = System.nanoTime()
          sink.update(e, i.toLong)
          // uniform terminal consumption: the fold's remap join is LAZY in
          // mem/delta mode (only the contracted CC runs eagerly), while
          // full mode materializes it via the snapshot write — without
          // this, mode "mem" defers each batch's O(accumulated V) remap to
          // the NEXT batch's clock and never pays the last one at all,
          // inflating every commit_overhead reading by one remap join
          sink.current.foreach(_.write.format("noop").mode("overwrite").save())
          (System.nanoTime() - t0) / 1e9
        }
        // state dirs would otherwise leak keepCommits × 10M-row snapshots
        // into /tmp per run
        stateDir.foreach(d => graft.engine.Fs.deleteRecursively(new java.io.File(d)))
        val v = perBatch * nBatches
        println(f"""{"mode":"$mode%s","factor":$f%d,"per_batch":$perBatch%d,"acc_vertices":$v%d,"first_sec":${times.head}%.2f,"last_sec":${times.last}%.2f,"total_sec":${times.sum}%.2f,"per_batch_sec":[${times.map(t => f"$t%.2f").mkString(",")}]}""")
        mode -> times.sum
      }.toMap
      println(f"""{"factor":$f%d,"commit_overhead_full_sec":${perMode("full") - perMode("mem")}%.2f,"commit_overhead_delta_sec":${perMode("delta") - perMode("mem")}%.2f}""")
    }
    spark.stop()
  }
}
