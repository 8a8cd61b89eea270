package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQueryProgress}

import graft.SparkTestBase

/** Final-plan regression guard for the STREAMING family — the micro-batch
  * twin of PlanSpec's batch final-plan pins (round-9 verdict next-7). A
  * streaming query's work happens inside micro-batch executions, so the
  * regenerable facts are read from `StreamingQueryProgress.stateOperators`
  * (Spark's public per-batch executed-plan telemetry): WHICH state
  * operators a plan compiles to, HOW MANY, and the state-store partition
  * count each freezes into its checkpoint. A silent extra state operator
  * (e.g. an accidental second dedupe or an agg losing its session-window
  * fusion) or a partition-sizing regression fails here, not in production.
  * PLANS.md's streaming section is this spec's table. */
class StreamStatePlanSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(minute: Int): Timestamp = new Timestamp(t0 + minute * 60000L)

  /** Run a MemoryStream lifecycle and return the last progress carrying
    * state-operator telemetry. */
  private def lastStateProgress(build: DataFrame => DataFrame,
      rows: Seq[(Timestamp, String, Double)],
      mode: OutputMode = OutputMode.Update()): StreamingQueryProgress = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = build(mem.toDF().toDF("ts", "event_type", "value"))
    val sq = out.writeStream.outputMode(mode)
      .format("memory").queryName(s"state_plan_${System.nanoTime()}")
      .start()
    try {
      mem.addData(rows: _*)
      sq.processAllAvailable()
      sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no progress with state operators"))
    } finally sq.stop()
  }

  private val someEvents = Seq(
    (ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(70), "view", 4.0))

  test("q168 shape: windowed agg compiles to ONE stateStoreSave operator") {
    val p = lastStateProgress(
      df => Streams.windowedAgg(df, watermark = Some("2 hours")), someEvents)
    assert(p.stateOperators.map(_.operatorName).toSeq == Seq("stateStoreSave"))
  }

  // contract-backed since round 11: q187 runs this exact shape through the
  // real micro-batch engine (file source, AvailableNow, sentinel flush)
  // under q74's batch oracle — this pin guards the operator FUSION only
  test("q74/q187 session shape: session-window agg keeps its fused session store") {
    val p = lastStateProgress(
      df => Streams.sessionWindowAgg(
        df.select(col("value").cast("long").as("user_id"), col("ts")),
        gap = "10 minutes", watermark = Some("1 hour")),
      someEvents, mode = OutputMode.Complete())
    assert(p.stateOperators.map(_.operatorName).toSeq ==
      Seq("sessionWindowStateStoreSaveExec"))
  }

  test("q173 shape: dedup compiles to ONE dedupe operator") {
    val p = lastStateProgress(
      df => Streams.dedupStream(df, Seq("event_type")), someEvents,
      mode = OutputMode.Append())
    assert(p.stateOperators.map(_.operatorName).toSeq == Seq("dedupe"))
  }

  test("q174 shape: key-only dedup compiles to dedupeWithinWatermark") {
    val p = lastStateProgress(
      df => Streams.dedupKeysWithinWatermark(df, Seq("event_type")), someEvents,
      mode = OutputMode.Append())
    assert(p.stateOperators.map(_.operatorName).toSeq ==
      Seq("dedupeWithinWatermark"))
  }

  test("q175 shape: fan-in self-join is ONE symmetricHashJoin; state partitions = shuffle conf") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long, Timestamp)]
    val out = Streams.fanInPairs(
      mem.toDF().toDF("sender", "beneficiary", "amount", "txn_id", "ts"),
      minTotal = 5.0)
    val sq = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"state_plan_fanin_${System.nanoTime()}")
      .start()
    try {
      mem.addData((1L, 9L, 10.0, 100L, ts(5)), (2L, 9L, 20.0, 101L, ts(10)))
      sq.processAllAvailable()
      val p = sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no progress with state operators"))
      assert(p.stateOperators.map(_.operatorName).toSeq == Seq("symmetricHashJoin"))
      // the partition count the FIRST start freezes into the checkpoint —
      // the number StreamSession sizes deliberately (8 by default in the
      // contract queries; the test session's shuffle conf here)
      assert(p.stateOperators.head.numShufflePartitions ==
        spark.conf.get("spark.sql.shuffle.partitions").toLong)
    } finally sq.stop()
  }

  test("q182 shape: attribution outer join is ONE symmetricHashJoin operator") {
    implicit val sqlCtx = spark.sqlContext
    val p = MemoryStream[(Long, Long, Timestamp)]
    val c = MemoryStream[(Long, Long, Timestamp)]
    val out = Streams.attributionJoin(
      p.toDF().toDF("user_id", "txn_id", "ts"),
      c.toDF().toDF("user_id", "txn_id", "ts"))
    val sq = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"state_plan_attr_${System.nanoTime()}")
      .start()
    try {
      p.addData((1L, 100L, ts(10)))
      c.addData((1L, 200L, ts(5)))
      sq.processAllAvailable()
      val prog = sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no progress with state operators"))
      assert(prog.stateOperators.map(_.operatorName).toSeq == Seq("symmetricHashJoin"))
    } finally sq.stop()
  }

  test("q197 shape: FULL OUTER attribution join is still ONE symmetricHashJoin operator") {
    implicit val sqlCtx = spark.sqlContext
    val p = MemoryStream[(Long, Long, Timestamp)]
    val c = MemoryStream[(Long, Long, Timestamp)]
    val out = Streams.attributionJoin(
      p.toDF().toDF("user_id", "txn_id", "ts"),
      c.toDF().toDF("user_id", "txn_id", "ts"),
      joinType = "full_outer")
    val sq = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"state_plan_attr_fo_${System.nanoTime()}")
      .start()
    try {
      p.addData((1L, 100L, ts(10)))
      c.addData((1L, 200L, ts(5)))
      sq.processAllAvailable()
      val prog = sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no progress with state operators"))
      assert(prog.stateOperators.map(_.operatorName).toSeq == Seq("symmetricHashJoin"))
    } finally sq.stop()
  }

  test("q183 shape: sketch-state heavy hitters is ONE stateStoreSave operator") {
    val p = lastStateProgress(
      df => Streams.heavyHittersStream(df, k = 2), someEvents,
      mode = OutputMode.Complete())
    assert(p.stateOperators.map(_.operatorName).toSeq == Seq("stateStoreSave"))
  }

  test("q191 shape: input two batches behind the watermark advance is dropped " +
      "(lateEvents wm lags eviction wm by one batch, SPARK-40925)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val out = mem.toDF().toDF("ts", "event_type", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    val sq = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"state_plan_late_${System.nanoTime()}")
      .start()
    try {
      def dropped: Long = sq.recentProgress
        .map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
      mem.addData((ts(120), "a", 1.0)) // advances eviction wm to minute 110
      sq.processAllAvailable() // incl. the watermark-advance batch, so the
      // lateEvents wm has caught up by the next addData (under AvailableNow
      // file triggers there is no intermediate advance batch — q191 needs
      // its old half TWO staged files behind; measured in the contract row)
      mem.addData((ts(10), "late", 1.0))
      sq.processAllAvailable()
      assert(dropped > 0L, "a row behind the caught-up watermark must be dropped")
      // and the dropped row's window never reaches the output
      val table = spark.table(sq.name).select(col("w.start").cast("long"))
        .as[Long].collect()
      assert(!table.contains(ts(10).getTime / 1000),
        "dropped row's window must not be emitted")
    } finally sq.stop()
  }

  test("q171 shape: explicit sessionization is ONE flatMapGroupsWithState operator") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streams.SessionEvent]
    val out = Streams.sessionizeStream(mem.toDS(), gapMs = 600000L)
    val sq = out.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName(s"state_plan_sess_${System.nanoTime()}")
      .start()
    try {
      mem.addData(Streams.SessionEvent(1L, ts(0)), Streams.SessionEvent(1L, ts(30)))
      sq.processAllAvailable()
      val p = sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
        .getOrElse(fail("no progress with state operators"))
      assert(p.stateOperators.map(_.operatorName).toSeq ==
        Seq("flatMapGroupsWithState"))
    } finally sq.stop()
  }

  test("q198 shape: transformWithState sessionization is ONE TWS operator " +
      "(RocksDB provider required)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[Streams.SessionEvent]
      val out = Streams.sessionizeStreamTws(mem.toDS(), gapMs = 600000L)
      val sq = out.writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName(s"state_plan_tws_${System.nanoTime()}")
        .start()
      try {
        mem.addData(Streams.SessionEvent(1L, ts(0)), Streams.SessionEvent(1L, ts(30)))
        sq.processAllAvailable()
        val p = sq.recentProgress.reverse.find(_.stateOperators.nonEmpty)
          .getOrElse(fail("no progress with state operators"))
        val names = p.stateOperators.map(_.operatorName).toSeq
        assert(names.length == 1 &&
          names.head.toLowerCase.contains("transformwithstate"),
          s"unexpected state operators: $names")
      } finally sq.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
