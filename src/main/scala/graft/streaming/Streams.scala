package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.11 / §7.5 extension — the
  * reference is batch-only; this is the "as new transactions are discovered"
  * path its prose gestures at, `01_aml_network_analysis.py:486`).
  *
  * Every builder works on both batch and streaming DataFrames: the same
  * declarative plan runs incrementally under a watermark in a stream, and
  * as one job in batch — which is how the batch DuckDB oracle validates the
  * streaming semantics.
  */
object Streams {

  /** Tumbling-window per-type event aggregation. With a watermark the state
    * store evicts windows older than the watermark — bounded state at any
    * scale. */
  def windowedAgg(events: DataFrame, watermark: Option[String]): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))
  }

  /** Streaming heavy hitters: the Misra–Gries sketch
    * ([[graft.functions.MisraGriesAgg]], registered as `approx_top_k`) as
    * a windowed streaming aggregate — per tumbling window, the
    * guaranteed-heavy event types with their lower-bound counts. The
    * sketch buffer IS the streaming aggregation state (the
    * TypedImperativeAggregate serializes into the state store), so state
    * per window is O(k) counters regardless of stream volume — the
    * streaming twin of q73's batch sketch, same mergeable guarantees.
    * Works batch or streaming from the same plan. */
  def heavyHittersStream(events: DataFrame, k: Int,
      watermark: Option[String] = Some("2 hours")): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(expr(s"approx_top_k(event_type, $k)").as("top"))
      .select(unix_millis(col("w.start")).as("start_ms"),
        explode(col("top")).as("hh"))
      .select(col("start_ms"), col("hh.item").as("item"),
        col("hh.count_lb").as("count_lb"))
  }

  final case class HHIn(start_ms: Long, item: String)
  final case class HHOut(start_ms: Long, item: String, count_lb: Long, ver: Long)

  /** [[heavyHittersStream]] on `transformWithState` with MAP state — the
    * Misra–Gries counters live in a `MapState[String, Long]` keyed by the
    * tumbling window (the third TWS state primitive, after q198's
    * ValueState and q200's ListState). Each batch pre-aggregates its
    * items, then applies the mergeable-summaries MG merge (Agarwal et al.
    * 2013, public): pointwise add, and if more than k counters survive,
    * subtract the (k+1)-th largest and drop the non-positives — the merge
    * under which any item with cnt·(k+1) > n is provably retained, the
    * same guarantee q183's oracle gates. Every batch emits the window's
    * retained counters tagged with a monotonically increasing VERSION
    * (ValueState), so a reader can select each window's latest NON-EMPTY
    * emission (max ver) — the append-mode equivalent of q183's
    * complete-mode read-back. Boundary: a fold whose merge decrements
    * every counter to zero emits nothing, so max-ver then reads the
    * previous batch's counters rather than the (empty) terminal state —
    * which cannot affect the containment gate, because MG empties a
    * window's counters only when that window holds NO guaranteed-heavy
    * item (a guaranteed item is never fully decremented), and such
    * windows contribute nothing to the gate.
    * TimeMode.None: state lives for the stream's lifetime; a production
    * deployment bounds it with `TTLConfig` instead of timers. */
  final class HeavyHittersProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, HHIn, HHOut] {
    @transient private var counters:
      org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var version:
      org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttl = org.apache.spark.sql.streaming.TTLConfig.NONE
      counters = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, ttl)
      version = getHandle.getValueState[Long]("ver", Encoders.scalaLong, ttl)
    }

    override def handleInputRows(windowStart: Long, rows: Iterator[HHIn],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[HHOut] = {
      val batch = collection.mutable.Map.empty[String, Long]
      rows.foreach(r => batch.update(r.item, batch.getOrElse(r.item, 0L) + 1L))
      val merged = collection.mutable.Map.empty[String, Long]
      if (counters.exists())
        counters.iterator().foreach { case (i, c) => merged.update(i, c) }
      batch.foreach { case (i, c) => merged.update(i, merged.getOrElse(i, 0L) + c) }
      val kept =
        if (merged.size <= k) merged.toMap
        else {
          // subtract the (k+1)-th largest count from everything, drop <= 0:
          // at most k counters survive and the n/(k+1) error bound holds
          val d = merged.values.toSeq.sorted(Ordering[Long].reverse)(k)
          merged.collect { case (i, c) if c - d > 0 => i -> (c - d) }.toMap
        }
      counters.clear()
      kept.foreach { case (i, c) => counters.updateValue(i, c) }
      val ver = (if (version.exists()) version.get() else 0L) + 1L
      version.update(ver)
      kept.iterator.map { case (i, c) => HHOut(windowStart, i, c, ver) }
    }
  }

  /** The [[heavyHittersStream]] plan on [[HeavyHittersProcessor]]. */
  def heavyHittersStreamTws(events: DataFrame, k: Int): Dataset[HHOut] = {
    implicit val inEnc: Encoder[HHIn] = Encoders.product[HHIn]
    implicit val outEnc: Encoder[HHOut] = Encoders.product[HHOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .select((expr("unix_millis(ts) div 3600000") * 3600000L)
        .as("start_ms"), col("event_type").as("item"))
      .as[HHIn]
      .groupByKey(_.start_ms)
      .transformWithState(new HeavyHittersProcessor(k),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Streaming structuring alert — the reference's aspiration "as new
    * transactions are discovered" (`01_aml_network_analysis.py:486`) made
    * real: per-beneficiary tumbling-window inflow totals with a watermark;
    * windows whose aggregate crosses the reporting threshold (reference
    * `:319`: > $10,000) become alerts. Works batch or streaming from the
    * same plan. */
  def structuringAlerts(txns: DataFrame, threshold: Double,
      windowLen: String = "1 hour", watermark: Option[String] = Some("2 hours")): DataFrame = {
    val src = watermark.fold(txns)(w => txns.withWatermark("ts", w))
    src.groupBy(window(col("ts"), windowLen).as("w"), col("beneficiary"))
      .agg(sum(col("amount")).as("total_amount"), count(lit(1)).as("n_txns"))
      .filter(col("total_amount") > threshold && col("n_txns") >= 2)
      .select(col("w.start").as("window_start"), col("beneficiary"),
        col("total_amount"), col("n_txns"))
  }

  /** Native gap-merging session windows (the q74 plan as a reusable
    * builder): the SAME declarative aggregation runs batch and streaming —
    * incrementally under a watermark, where the state store merges
    * in-flight sessions and closes one once the watermark passes its gap.
    * Semantics (mirrored exactly by q74's oracle): strict-< merge, window
    * end = last event + gap. */
  def sessionWindowAgg(events: DataFrame, gap: String,
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_millis(col("sw.start")).as("start_ms"),
        unix_millis(col("sw.end")).as("end_ms"),
        col("n_events"))
  }

  /** Batch sessionization via window functions (gap > gapMs starts a new
    * session): lag → break flags → running sum → per-session aggregate.
    * Two window passes over one shuffle on user_id. Millisecond integers
    * keep both engines bit-exact. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("prev", lag(col("ms"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev").isNull || col("ms") - col("prev") > gapMs, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"),
        count(lit(1)).as("n_events"))
  }

  /** Streaming fan-in structuring pairs — the q17 motif
    * (`(a)-[e1]->(m); (b)-[e2]->(m)`, reference
    * `01_aml_network_analysis.py:308-319`) as a watermarked stream-stream
    * self-join: two senders into one beneficiary within `within` of each
    * other, combined amount over `minTotal`. The event-time range bound plus
    * the watermark lets Spark evict join state older than
    * watermark + within, so state is bounded at any scale. The same plan
    * runs on a batch frame (StreamsSpec proves stream ≡ batch).
    *
    * Expected noise: Catalyst pushes the `minTotal` filter (it references
    * both sides) into the join condition, and StreamingJoinHelper logs a
    * WARN per non-time conjunct it cannot solve for a state constraint —
    * the TIME conjuncts still yield the watermark constraint, so state IS
    * evicted. Pinned by StreamsSpec's "state is EVICTED" test (the same
    * log shows `generated watermark constraint`, and numRowsTotal shrinks
    * once the watermark passes). */
  def fanInPairs(txns: DataFrame, minTotal: Double, within: String = "1 hour",
      watermark: String = "2 hours", streaming: Boolean = true): DataFrame = {
    def side(p: String): DataFrame = {
      val base = if (streaming) txns.withWatermark("ts", watermark) else txns
      base.select(col("sender").as(s"${p}_id"), col("beneficiary").as(s"${p}_ben"),
        col("amount").as(s"${p}_amount"), col("txn_id").as(s"${p}_txn"),
        col("ts").as(s"${p}_ts"))
    }
    side("a").join(side("b"),
        col("a_ben") === col("b_ben") && col("a_id") < col("b_id") &&
          col("b_ts") >= col("a_ts") - expr(s"interval $within") &&
          col("b_ts") <= col("a_ts") + expr(s"interval $within"))
      .where(col("a_amount") + col("b_amount") > minTotal)
      .select(col("a_id"), col("b_id"), col("a_ben").as("m_id"),
        col("a_txn"), col("b_txn"),
        (col("a_amount") + col("b_amount")).as("total"))
  }

  /** Stream-stream LEFT OUTER attribution join: every purchase matched to
    * the same user's clicks within `within` BEFORE it; purchases with no
    * such click are emitted null-extended — but only once the click-side
    * watermark has passed the end of their match window, when Spark can
    * PROVE no matching click can still arrive. The event-time range bound
    * plus both watermarks keeps the join state bounded; the unmatched-row
    * delay is the semantic price of streaming outer joins (StreamsSpec
    * drives it cross-batch). Same plan runs batch (`streaming = false`),
    * where unmatched rows appear immediately. `joinType = "full_outer"`
    * additionally emits never-attributed CLICKS null-extended on the
    * purchase side under the same watermark-proof rule (q197); for the
    * default left_outer the c_user coalesce arm is never taken, so the
    * output is unchanged. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
      within: String = "30 minutes", watermark: String = "1 hour",
      streaming: Boolean = true, joinType: String = "left_outer"): DataFrame = {
    def wm(df: DataFrame): DataFrame =
      if (streaming) df.withWatermark("ts", watermark) else df
    val p = wm(purchases).select(col("user_id").as("p_user"),
      col("txn_id").as("purchase_id"), col("ts").as("p_ts"))
    val c = wm(clicks).select(col("user_id").as("c_user"),
      col("txn_id").as("click_id"), col("ts").as("c_ts"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"interval $within") &&
        col("c_ts") <= col("p_ts"),
      joinType)
      .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
        col("purchase_id"), col("p_ts"), col("click_id"), col("c_ts"))
  }

  /** Streaming exact deduplication: watermark + `dropDuplicates` on the key
    * columns — Spark keeps one state-store row per key seen inside the
    * watermark horizon, so state is bounded while late duplicates are still
    * caught. The streaming twin of the batch exact-dedup operator
    * (`graft.ext.TextDedup.dedupExact`); StreamsSpec proves MemoryStream
    * output ≡ batch `dropDuplicates` over the same rows. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicates(keyCols :+ tsCol)

  /** Key-only streaming dedup: unlike [[dedupStream]] (which keys state on
    * key+timestamp, so the same key at two timestamps survives twice), this
    * drops ANY re-occurrence of a key while its first sighting is within the
    * watermark horizon — `dropDuplicatesWithinWatermark` semantics, the
    * shape used to suppress re-crawled documents whose fetch timestamp
    * differs. State holds one row per distinct key per horizon and is
    * evicted when the watermark passes, so it is bounded at any scale. */
  def dedupKeysWithinWatermark(events: DataFrame, keyCols: Seq[String],
      tsCol: String = "ts", watermark: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Incremental connected components as a streaming sink: each micro-batch
    * of edges is folded into a driver-held assignment via
    * [[graft.graph.IncrementalCC.step]] (contracted-graph CC, not a full
    * rebuild). The assignment is checkpointed every batch, so the lineage
    * chain never grows with the number of batches. Use with
    * `edges.writeStream.foreachBatch(sink.update _)`; read `sink.current`
    * between/after batches.
    *
    * RESTART: with `stateDir` set, every folded assignment is committed to
    * `stateDir/assign-<batchId>` (parquet; the `_SUCCESS` marker makes the
    * commit atomic — a crash mid-write leaves no marker and the directory
    * is ignored), and a new sink built over the same `stateDir` resumes
    * from the highest committed batch. Micro-batch replay is handled the
    * way every foreachBatch sink must: Structured Streaming re-delivers
    * the last batch after a crash-before-sink-commit with the SAME
    * batchId and (for replayable sources) the same rows, so `update`
    * SKIPS any batchId ≤ the last committed one — exactly-once state
    * folds over at-least-once delivery. The committed parquet also
    * replaces the in-memory lineage root, so restart cost is one scan of
    * the assignment, not a replay of history. Without `stateDir` the sink
    * is single-lifecycle, as before. Old commits are pruned to the last
    * `keepCommits` (default 2 — the live one plus its predecessor for
    * post-mortems).
    *
    * COMMIT COST / `snapshotEvery` (measured: graft.SinkScale / SCALE.md
    * "durable-sink commit law"): the default (1) writes the FULL
    * assignment every micro-batch — an O(V) write per batch that on
    * local/HDFS-fast storage is a net WIN, not a cost: the committed
    * parquet becomes the lineage root, so the next fold plans over a
    * compact columnar scan instead of executor-resident checkpoint blocks
    * (10-batch total 124.5 s vs the no-commit fold's 142.6 s at 10M
    * accumulated vertices, uniform per-batch materialization). `snapshotEvery = N > 1` switches
    * to DELTA commits for write-constrained paths (object storage, commit
    * SLAs — a 10⁹-row assignment is ~15 GB over the wire per batch, the
    * delta is O(batch)): each batch writes only the rows whose component
    * changed (`delta-<batchId>`, a free boolean filter on the fold's own
    * remap join — [[graft.graph.IncrementalCC.stepWithChanges]], NOT a
    * second O(V) anti-join), with a full `assign-<batchId>` snapshot every
    * N-th commit bounding restart to one snapshot scan plus at most N−1
    * delta folds (latest-wins per id — components only ever merge, so
    * deltas carry no tombstones) and bounding the resident-lineage window
    * to N batches. Pick N so snapshot_cost / N ≪ delta cost (N ≈ 10). */
  final class IncrementalCCSink(checkpointDir: Option[String] = None,
      stateDir: Option[String] = None, keepCommits: Int = 2,
      snapshotEvery: Int = 1) {
    import graft.graph.IncrementalCC
    require(keepCommits >= 1, "keepCommits must be >= 1")
    require(snapshotEvery >= 1, "snapshotEvery must be >= 1")
    @volatile private var assign: Option[DataFrame] = None
    @volatile private var lastBatchId: Long = -1L
    @volatile private var restored = false
    // delta commits since the last full snapshot (valid once restored)
    @volatile private var sinceSnapshot: Int = 0

    private def committed(d: String, prefix: String): Seq[(Long, java.io.File)] = {
      val root = new java.io.File(d)
      Option(root.listFiles()).getOrElse(Array.empty).toSeq
        .filter(f => f.isDirectory && f.getName.startsWith(prefix) &&
          new java.io.File(f, "_SUCCESS").exists())
        .flatMap(f => f.getName.stripPrefix(prefix).toLongOption.map(_ -> f))
        .sortBy(_._1)
    }
    private def committedBatches(d: String) = committed(d, "assign-")
    private def committedDeltas(d: String) = committed(d, "delta-")

    /** Reload the newest committed assignment — newest full snapshot plus
      * any later delta commits, latest-wins per id (needs a session, so it
      * runs lazily on the first `update`/`currentOrRestore` of a
      * lifecycle). Callers hold the sink lock — restore and fold must not
      * interleave (a restore completing after a concurrent fold would roll
      * `assign`/`lastBatchId` back to the stale commit and the next batch
      * would fold over lost state). */
    private def restore(spark: org.apache.spark.sql.SparkSession): Unit =
      stateDir.foreach { d =>
        if (!restored) {
          committedBatches(d).lastOption.foreach { case (bid, f) =>
            val snap = spark.read.parquet(f.getPath)
            val deltas = committedDeltas(d).filter(_._1 > bid)
            assign = Some(if (deltas.isEmpty) snap else {
              // explicit schema: an all-unchanged batch commits an EMPTY
              // delta dir (zero part files), which schema inference rejects
              val dU = deltas.map { case (b, df) =>
                spark.read.schema(snap.schema).parquet(df.getPath)
                  .withColumn("__b", lit(b))
              }.reduce(_ unionByName _)
              val latest = dU.groupBy("id")
                .agg(expr("max_by(component, __b)").as("component"))
              snap.join(latest, Seq("id"), "left_anti").unionByName(latest)
                .localCheckpoint()
            })
            lastBatchId = math.max(bid, deltas.lastOption.fold(bid)(_._1))
            sinceSnapshot = deltas.size
          }
          restored = true
        }
      }

    /** The latest `(id, component)` assignment (None before the first batch).
      *
      * VALIDITY WINDOW: under durable state with `snapshotEvery = 1` the
      * frame plans over the latest committed parquet, and commit pruning
      * keeps only the newest `keepCommits` directories — so a frame handed
      * out here stays readable only until `keepCommits` further batches
      * fold (after that its backing files are pruned and a late consume
      * throws FileNotFoundException, parquet reads being lazy). Consume
      * (or `.localCheckpoint()`) a held frame before folding that many
      * more batches, or raise `keepCommits` to the hold horizon. In DELTA
      * mode (`snapshotEvery > 1`) a frame handed out between snapshots is
      * backed by the fold's executor-resident localCheckpoint blocks, not
      * parquet — it stays readable for this JVM's lifetime regardless of
      * pruning, until the next full snapshot swaps the backing to parquet
      * (at which point the parquet window above applies). */
    def current: Option[DataFrame] = assign
    /** [[current]], restoring from `stateDir` first if this lifecycle has
      * not folded a batch yet. */
    def currentOrRestore(spark: org.apache.spark.sql.SparkSession): Option[DataFrame] =
      synchronized { restore(spark); assign }

    def update(batch: DataFrame, batchId: Long): Unit = synchronized {
      restore(batch.sparkSession)
      // replayed micro-batch: already folded. The skip is only meaningful
      // under DURABLE state — batchIds are comparable only within one
      // checkpoint lineage, and a single-lifecycle sink reused across a
      // second query (fresh checkpoint, ids restarting at 0) must keep
      // folding, as it always did.
      if (stateDir.isDefined && batchId <= lastBatchId) return
      val a = assign.getOrElse(IncrementalCC.emptyAssignment(batch))
      val (next, changed) = IncrementalCC.stepWithChanges(a, batch, checkpointDir)
      stateDir match {
        case Some(d) =>
          // full snapshot on the first-ever commit (restore needs a base)
          // and every snapshotEvery-th thereafter; O(batch) deltas between
          val fullSnapshot = assign.isEmpty || sinceSnapshot + 1 >= snapshotEvery
          if (fullSnapshot) {
            val path = s"$d/assign-$batchId"
            next.write.mode("overwrite").parquet(path)
            // the committed file IS the new lineage root (restart reads it
            // anyway; reading it now keeps memory flat and drops the step's
            // localCheckpoint blocks at the next GC)
            assign = Some(batch.sparkSession.read.parquet(path))
            sinceSnapshot = 0
            // prune: keep the newest keepCommits snapshots, and only the
            // deltas newer than the oldest KEPT snapshot (each kept
            // snapshot stays roll-forward-able)
            val snaps = committedBatches(d)
            snaps.dropRight(keepCommits)
              .foreach { case (_, f) => graft.engine.Fs.deleteRecursively(f) }
            val oldestKept = snaps.takeRight(keepCommits).head._1
            committedDeltas(d).filter(_._1 <= oldestKept)
              .foreach { case (_, f) => graft.engine.Fs.deleteRecursively(f) }
          } else {
            // rows whose assignment changed this batch: new ids + remapped
            // components (components only merge, so no deletions to carry);
            // the set falls out of the fold itself — no anti-join
            changed.write.mode("overwrite").parquet(s"$d/delta-$batchId")
            assign = Some(next) // lazyFresh-checkpointed by step — bounded lineage
            sinceSnapshot += 1
          }
        case None => assign = Some(next)
      }
      lastBatchId = batchId
    }
  }

  final case class SessionEvent(user_id: Long, ts: Timestamp)
  final case class SessionOut(user_id: Long, start_ms: Long, end_ms: Long, n_events: Long)
  // public: Spark's product encoder codegen must be able to reach it
  final case class SessionState(startMs: Long, endMs: Long, n: Long)

  /** Streaming sessionization with explicit state: open sessions live in the
    * state store keyed by user, closed either by a later event past the gap
    * or by event-time timeout once the watermark passes. The stateful
    * mirror of [[sessionizeBatch]]. */
  def sessionizeStream(events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val stateEnc: Encoder[SessionState] = Encoders.product[SessionState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(user: Long, events: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionOut(user, s.startMs, s.endMs, s.n))
      }
      val sorted = events.map(_.ts.getTime).toSeq.sorted
      var closed = List.empty[SessionOut]
      var cur = state.getOption
      sorted.foreach { ms =>
        cur match {
          case Some(s) if ms - s.endMs <= gapMs =>
            cur = Some(s.copy(endMs = math.max(s.endMs, ms), n = s.n + 1))
          case Some(s) =>
            closed ::= SessionOut(user, s.startMs, s.endMs, s.n)
            cur = Some(SessionState(ms, ms, 1))
          case None =>
            cur = Some(SessionState(ms, ms, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** [[sessionizeStream]] on Spark 4's `transformWithState` API — the
    * successor to flatMapGroupsWithState (SPARK-46815, public): typed
    * composable state (`ValueState` here) plus explicit event-time TIMERS
    * instead of the single per-group timeout. Same session semantics: a
    * batch's events fold into the open session (gap-merge), a later event
    * past the gap closes it, and a timer registered at `end + gap` closes
    * the session once the watermark proves no extending event can arrive.
    * A session extension re-registers the timer and deletes the stale one;
    * a stale timer that still fires (same-batch extension) is ignored
    * because its expiry predates the live session's horizon.
    *
    * Requires the RocksDB state-store provider (transformWithState is
    * implemented only on it — which is also the at-scale store, q184).
    * q198 certifies output-hash equality with q171's
    * flatMapGroupsWithState twin under the shared batch oracle. */
  /** The session fold + timer discipline shared by [[SessionProcessor]]
    * (q198) and [[SessionMigrationProcessor]] (q202) — the two differ only
    * in their parent class (plain vs with-initial-state), which Scala
    * can't abstract over, so the logic lives in this self-typed trait. */
  private[streaming] trait SessionLogic {
    self: org.apache.spark.sql.streaming.StatefulProcessor[
      Long, SessionEvent, SessionOut] =>
    protected def gapMs: Long
    @transient protected var session:
      org.apache.spark.sql.streaming.ValueState[SessionState] = _

    protected def initSessionState(): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    protected def onRows(user: Long,
        rows: Iterator[SessionEvent]): Iterator[SessionOut] = {
      val before = if (session.exists()) Some(session.get()) else None
      val sorted = rows.map(_.ts.getTime).toSeq.sorted
      var closed = List.empty[SessionOut]
      var cur = before
      sorted.foreach { ms =>
        cur match {
          case Some(s) if ms - s.endMs <= gapMs =>
            cur = Some(s.copy(endMs = math.max(s.endMs, ms), n = s.n + 1))
          case Some(s) =>
            closed ::= SessionOut(user, s.startMs, s.endMs, s.n)
            cur = Some(SessionState(ms, ms, 1))
          case None =>
            cur = Some(SessionState(ms, ms, 1))
        }
      }
      cur.foreach { s =>
        session.update(s)
        before.filter(_.endMs != s.endMs)
          .foreach(b => getHandle.deleteTimer(b.endMs + gapMs))
        getHandle.registerTimer(s.endMs + gapMs)
      }
      closed.reverseIterator
    }

    protected def onTimer(user: Long,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      if (session.exists()) {
        val s = session.get()
        // a stale timer (the same batch's input already extended or
        // replaced the session) must not close the live session
        if (info.getExpiryTimeInMs >= s.endMs + gapMs) {
          session.clear()
          Iterator.single(SessionOut(user, s.startMs, s.endMs, s.n))
        } else Iterator.empty
      } else Iterator.empty
  }

  final class SessionProcessor(protected val gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SessionEvent, SessionOut] with SessionLogic {
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      initSessionState()
    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] =
      onRows(user, rows)
    override def handleExpiredTimer(user: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      onTimer(user, info)
  }

  /** A batch-computed open session handed to
    * [[SessionMigrationProcessor]] as transformWithState INITIAL STATE. */
  final case class SessionSeed(user_id: Long, startMs: Long, endMs: Long, n: Long)

  /** [[SessionProcessor]] with INITIAL STATE — the fMGWS → TWS (or
    * batch → streaming) state-migration path: each user's open session,
    * computed from the legacy half in batch, seeds the ValueState before
    * the first micro-batch, with its closure timer registered at
    * `end + gap` exactly as a live fold would have (so a seeded session
    * that nothing extends is still flushed by the terminal watermark —
    * the q171 emission rule). q202 certifies the migrated stream against
    * q171's whole-table oracle: a seed that was dropped, double-counted,
    * or left timer-less hash-fails. */
  final class SessionMigrationProcessor(protected val gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, SessionEvent, SessionOut, SessionSeed] with SessionLogic {
    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      initSessionState()
    override def handleInitialState(user: Long, seed: SessionSeed,
        timers: org.apache.spark.sql.streaming.TimerValues): Unit = {
      session.update(SessionState(seed.startMs, seed.endMs, seed.n))
      getHandle.registerTimer(seed.endMs + gapMs)
    }
    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[SessionOut] =
      onRows(user, rows)
    override def handleExpiredTimer(user: Long,
        timers: org.apache.spark.sql.streaming.TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] =
      onTimer(user, info)
  }

  /** The [[sessionizeStream]] plan on [[SessionProcessor]] —
    * `transformWithState`, EventTime time mode, append output. */
  def sessionizeStreamTws(events: Dataset[SessionEvent], gapMs: Long,
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** [[sessionizeStreamTws]] warm-started from batch-computed open
    * sessions ([[SessionMigrationProcessor]]). */
  def sessionizeStreamTwsMigrated(events: Dataset[SessionEvent], gapMs: Long,
      seeds: Dataset[SessionSeed],
      watermarkDelay: String = "1 hour"): Dataset[SessionOut] = {
    implicit val outEnc: Encoder[SessionOut] = Encoders.product[SessionOut]
    implicit val seedEnc: Encoder[SessionSeed] = Encoders.product[SessionSeed]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionMigrationProcessor(gapMs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append(),
        seeds.groupByKey(_.user_id))
  }

  final case class ValueEvent(
      user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class AnomalyOut(user_id: Long, event_id: Long, value: Double, z: Double)
  /** Per-key rolling history: the last ≤ lookback values, oldest first. */
  final case class AnomalyState(values: Seq[Double])

  /** Streaming rolling z-score anomaly detection — the stateful mirror of
    * [[graft.ext.TimeSeries.rollingZScore]]: each event is scored against
    * the SAME entity's previous ≤`lookback` values (state carried across
    * micro-batches), flagged when `|z| > threshold` after ≥`minObs` prior
    * observations, then appended to the history. Within a batch, events
    * are ordered by (ts, event_id) — with in-order arrival the emitted
    * flags are exactly the batch operator's rows, which is how
    * StreamsSpec validates it. State is O(lookback) doubles per live key;
    * pass `stateTtlMs > 0` to evict quiet keys via processing-time
    * timeout (a real deployment with a trigger interval wants this; the
    * default NoTimeout keeps state for every key ever seen — and avoids
    * the empty-micro-batch busy loop timeouts induce under
    * MemoryStream's immediate trigger). */
  def anomalyStream(events: Dataset[ValueEvent], lookback: Int = 16,
      minObs: Int = 8, threshold: Double = 2.5,
      stateTtlMs: Long = 0L): Dataset[AnomalyOut] = {
    implicit val outEnc: Encoder[AnomalyOut] = Encoders.product[AnomalyOut]
    implicit val stateEnc: Encoder[AnomalyState] = Encoders.product[AnomalyState]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    def update(user: Long, events: Iterator[ValueEvent],
        state: GroupState[AnomalyState]): Iterator[AnomalyOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var hist = state.getOption.map(_.values.toVector).getOrElse(Vector.empty)
      val out = Vector.newBuilder[AnomalyOut]
      events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val n = hist.length
        if (n >= minObs) {
          // same sum-of-squares identity, same accumulation order
          // (oldest→newest) as the batch window — scores match exactly
          var s = 0.0; var ss = 0.0
          hist.foreach { v => s += v; ss += v * v }
          val varNum = ss - s * s / n
          if (varNum > 0) {
            val z = (e.value - s / n) / math.sqrt(varNum / (n - 1))
            if (math.abs(z) > threshold)
              out += AnomalyOut(user, e.event_id, e.value,
                BigDecimal(z).setScale(3, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble)
          }
        }
        hist = (hist :+ e.value).takeRight(lookback)
      }
      state.update(AnomalyState(hist))
      if (stateTtlMs > 0) state.setTimeoutDuration(stateTtlMs)
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        if (stateTtlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(update)
  }

  /** [[anomalyStream]] on `transformWithState` with LIST state — the
    * rolling ≤`lookback` history lives in a `ListState[Double]` (RocksDB
    * stores list elements as separate appended entries, so the common
    * fast path — append one value — writes O(1), not O(lookback); the
    * truncating rewrite via `put` only runs once the history is full).
    * Identical fold, ordering, and rounding as [[anomalyStream]]; q200
    * certifies output-hash equality with the flatMapGroupsWithState twin
    * under q114's batch oracle. TimeMode.None: no timers — state lives
    * for the stream's lifetime exactly like the fMGWS NoTimeout default. */
  final class AnomalyProcessor(lookback: Int, minObs: Int, threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ValueEvent, AnomalyOut] {
    @transient private var hist:
      org.apache.spark.sql.streaming.ListState[Double] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      hist = getHandle.getListState[Double]("hist",
        Encoders.scalaDouble, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(user: Long, events: Iterator[ValueEvent],
        timers: org.apache.spark.sql.streaming.TimerValues): Iterator[AnomalyOut] = {
      var h = if (hist.exists()) hist.get().toVector else Vector.empty
      val before = h
      val out = Vector.newBuilder[AnomalyOut]
      events.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val n = h.length
        if (n >= minObs) {
          var s = 0.0; var ss = 0.0
          h.foreach { v => s += v; ss += v * v }
          val varNum = ss - s * s / n
          if (varNum > 0) {
            val z = (e.value - s / n) / math.sqrt(varNum / (n - 1))
            if (math.abs(z) > threshold)
              out += AnomalyOut(user, e.event_id, e.value,
                BigDecimal(z).setScale(3, BigDecimal.RoundingMode.HALF_UP)
                  .toDouble)
          }
        }
        h = (h :+ e.value).takeRight(lookback)
      }
      // append-only while the history is filling; full rewrite only when
      // old values rolled off the front
      if (before.nonEmpty && h.startsWith(before))
        h.drop(before.length).foreach(hist.appendValue)
      else hist.put(h.toArray)
      out.result().iterator
    }
  }

  /** The [[anomalyStream]] plan on [[AnomalyProcessor]]. */
  def anomalyStreamTws(events: Dataset[ValueEvent], lookback: Int = 16,
      minObs: Int = 8, threshold: Double = 2.5): Dataset[AnomalyOut] = {
    implicit val outEnc: Encoder[AnomalyOut] = Encoders.product[AnomalyOut]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .transformWithState(new AnomalyProcessor(lookback, minObs, threshold),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }
}
