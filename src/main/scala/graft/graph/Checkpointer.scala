package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lineage truncation for iterative DataFrame algorithms (CC, Pregel).
  *
  * `localCheckpoint` (the default) stores blocks on executors — fast, no
  * durable storage needed, right for local mode — but on a real cluster an
  * executor loss mid-iteration is unrecoverable because the lineage is gone.
  * Passing a reliable `dir` switches to `checkpoint()`, which writes to the
  * (HDFS/S3) checkpoint directory and survives executor loss — the
  * reference's `spark.sparkContext.setCheckpointDir` pattern
  * (`/root/reference/01_aml_network_analysis.py:122,145`).
  *
  * When the caller passes no explicit dir, the session conf
  * `spark.graft.checkpointDir` is consulted as the default — so a cluster
  * operator can flip EVERY iterative operator (CC, SCC, Pregel, KCore,
  * BFS, shortest paths, label propagation, incremental CC, PPR) to
  * reliable checkpointing with one `spark.conf.set`, no code edits, the
  * way the reference flips it globally via `setCheckpointDir`. An explicit
  * `dir` argument still wins; with neither, behavior is unchanged
  * (`localCheckpoint`).
  *
  * The checkpoint dir is process-global SparkContext state, so it is only
  * set here when unset: concurrent operators passing *different* dirs would
  * otherwise race on it mid-iteration. If a dir is already configured (by
  * the session owner or an earlier operator) reliable checkpoints go there;
  * callers that need a specific location must set it on the context
  * themselves before running.
  */
private[graft] final case class Checkpointer(
    spark: SparkSession, dir: Option[String]) {
  private val effectiveDir: Option[String] = dir.orElse(
    spark.conf.getOption(Checkpointer.ConfKey).filter(_.nonEmpty))
  effectiveDir.foreach { d =>
    if (spark.sparkContext.getCheckpointDir.isEmpty)
      spark.sparkContext.setCheckpointDir(d)
  }
  def apply(df: DataFrame): DataFrame =
    if (effectiveDir.isDefined) df.checkpoint() else df.localCheckpoint()

  /** Checkpoint AND reset the new leaf's statistics to the session default.
    *
    * `Dataset.checkpoint`/`localCheckpoint` copies the ORIGIN plan's
    * *estimated* `sizeInBytes` onto the new `LogicalRDD` leaf. For an
    * iterative algorithm whose round plan self-joins its own state — SCC's
    * pointer jump is `state ⋈ state` — that estimate SQUARES every round:
    * the stored BigInt doubles in bit-length per generation, and by round
    * ~20 the driver spends minutes per round multiplying million-bit
    * numbers inside the stats visitor (measured: an 18-minute driver stall
    * on a 150-vertex cycle). Rewrapping the checkpointed RDD through
    * `createDataFrame` makes the leaf a fresh `LogicalRDD` with default
    * statistics, so per-round stats stay constant-size. The extra
    * InternalRow↔Row conversion applies only to the narrow iteration state
    * (2–3 fixed-width columns), not to operator payloads. Algorithms whose
    * round plans join state with *input* (CC, Pregel, k-core) grow stats
    * linearly and keep the cheaper [[apply]]. */
  def fresh(df: DataFrame): DataFrame = resetStats(apply(df))

  /** Stats reset alone, for a frame that is ALREADY checkpointed: rewraps
    * the materialized RDD in a fresh leaf with default statistics, no new
    * materialization. */
  def resetStats(ck: DataFrame): DataFrame =
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)

  /** Checkpoint `df` and return its convergence fingerprint, paying ONE
    * Spark job in local mode instead of two: the checkpoint is taken
    * lazily (`localCheckpoint(eager = false)` only marks the plan's RDD
    * for caching) and the fingerprint aggregate is the materializing
    * action — the scan that computes the checksum also computes and pins
    * the blocks. The iterative loops' driver-action count was the
    * dominant q60/q16 cost at bench scale (15k-row rounds are pure fixed
    * job overhead), so halving jobs-per-round matters more than any
    * per-row work. In reliable mode the checkpoint stays eager (the
    * checkpoint-file write is its own job regardless) and the fingerprint
    * scans the checkpointed state as before. */
  def fingerprinted(df: DataFrame): (DataFrame, (Long, Long)) = {
    val ck = if (effectiveDir.isDefined) apply(df) else df.localCheckpoint(false)
    (ck, Checkpointer.fingerprint(ck))
  }

  /** Checkpoint `df` and return the number of rows whose boolean column
    * `chgCol` is true, counted by a long accumulator DURING the
    * checkpoint-materializing scan — the cheapest possible convergence
    * probe: no aggregate exchange, no collect stage, just the pinning
    * pass itself (vs [[fingerprinted]]'s two extra agg stages per round).
    * Accumulator counts can only be inflated by task retries (a partial
    * task adds, the retry adds again), never deflated, so a loop that
    * stops on `changed == 0` can run a harmless extra round but can
    * never stop early — safe for convergence, unlike an accumulator
    * row-count driving data-dependent logic. */
  def changeCounted(df: DataFrame, chgCol: String): (DataFrame, Long) = {
    val ck = if (effectiveDir.isDefined) apply(df) else df.localCheckpoint(false)
    val acc = spark.sparkContext.longAccumulator
    val idx = ck.schema.fieldIndex(chgCol)
    ck.queryExecution.toRdd.foreachPartition { it =>
      var n = 0L
      while (it.hasNext) if (it.next().getBoolean(idx)) n += 1
      acc.add(n)
    }
    (ck, acc.value)
  }

  /** Checkpoint `df` and return its row count — the same one-job fusion as
    * [[fingerprinted]], for loops whose convergence check is a count. */
  def counted(df: DataFrame): (DataFrame, Long) = {
    val ck = if (effectiveDir.isDefined) apply(df) else df.localCheckpoint(false)
    (ck, ck.count())
  }

  /** Lazy lineage truncation: no dedicated materialization job at all —
    * the frame is marked for caching and the FIRST downstream action
    * computes and pins it (later readers hit the cache). Right for
    * checkpoints that exist only to bound plan depth and are consumed by
    * a nearby action anyway (accumulator unions, per-phase edge subsets);
    * wrong when the caller needs materialize-now semantics ([[fresh]]'s
    * stats reset, or state read concurrently). Reliable mode stays eager:
    * a lazily-reliable checkpoint would re-run the plan a second time to
    * write the checkpoint files. */
  def lazily(df: DataFrame): DataFrame =
    if (effectiveDir.isDefined) apply(df) else df.localCheckpoint(false)

  /** [[lazily]] + stats reset — the lazy form of [[fresh]] for
    * fixed-iteration loops with no per-round action: bounds both plan
    * depth and the inherited stats estimate while deferring every round's
    * materialization to the loop's consumer (one job cascade instead of a
    * job per round). */
  def lazyFresh(df: DataFrame): DataFrame = resetStats(lazily(df))
}

private[graft] object Checkpointer {
  /** Session conf key holding the default reliable-checkpoint directory. */
  val ConfKey = "spark.graft.checkpointDir"

  /** (row count, XOR-combined xxhash64 over all columns) — the shared
    * convergence checksum of the iterative operators: one aggregate scan,
    * order-independent, and XOR-cancellation-free as long as the state is
    * distinct per row (every caller's state is keyed). */
  def fingerprint(state: DataFrame): (Long, Long) = {
    val row = state
      .select(xxhash64(state.columns.map(col).toIndexedSeq: _*).as("h"))
      .agg(count(lit(1)).as("c"), coalesce(expr("bit_xor(h)"), lit(0L)).as("x"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
