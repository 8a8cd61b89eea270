package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.streaming.Streams.SessionEvent

class StreamsSpec extends SparkTestBase {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
  private def ts(minute: Int): Timestamp = new Timestamp(t0 + minute * 60000L)

  test("windowed aggregation: same plan runs batch and streaming") {
    val batch = Seq(
      (ts(5), "click", 1.0), (ts(20), "click", 2.0),
      (ts(70), "click", 4.0), (ts(75), "view", 8.0)
    ).toDF("ts", "event_type", "value")
    val got = Streams.windowedAgg(batch, None)
      .orderBy("window_start", "event_type")
      .select(col("event_type"), col("n_events"), col("total_value"))
      .as[(String, Long, Double)].collect().toSeq
    assert(got == Seq(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val sq = Streams.windowedAgg(mem.toDF().toDF("ts", "event_type", "value"), Some("2 hours"))
      .writeStream.format("memory").queryName("win_agg").outputMode("complete").start()
    try {
      mem.addData((ts(5), "click", 1.0), (ts(20), "click", 2.0), (ts(70), "view", 8.0))
      sq.processAllAvailable()
      val streamed = spark.table("win_agg")
        .select(col("event_type"), col("n_events"), col("total_value"))
        .as[(String, Long, Double)].collect().toSet
      assert(streamed == Set(("click", 2L, 3.0), ("view", 1L, 8.0)))
    } finally sq.stop()
  }

  test("streaming structuring alerts fire when windowed inflow crosses the threshold") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, Double)]
    val sq = Streams.structuringAlerts(
        mem.toDF().toDF("ts", "beneficiary", "amount"), threshold = 10000.0)
      .writeStream.format("memory").queryName("alerts").outputMode("complete").start()
    try {
      mem.addData(
        (ts(5), 7L, 6000.0), (ts(20), 7L, 6000.0),   // 12k within one hour -> alert
        (ts(10), 8L, 6000.0), (ts(70), 8L, 6000.0),  // split across windows -> no alert
        (ts(15), 9L, 12000.0))                       // single txn -> no alert (n >= 2)
      sq.processAllAvailable()
      val alerts = spark.table("alerts")
        .select("beneficiary", "total_amount", "n_txns")
        .as[(Long, Double, Long)].collect().toSeq
      assert(alerts == Seq((7L, 12000.0, 2L)))
    } finally sq.stop()
  }

  test("batch sessionization splits on gaps over threshold") {
    val ev = Seq(
      (1L, 10L, ts(0)), (2L, 10L, ts(10)), (3L, 10L, ts(50)), // gap 40min -> new session
      (4L, 20L, ts(0))
    ).toDF("event_id", "user_id", "ts")
    val got = Streams.sessionizeBatch(ev, gapMs = 30 * 60 * 1000L)
      .select("user_id", "sid", "n_events").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((10L, 1L, 2L), (10L, 2L, 1L), (20L, 1L, 1L)))
  }

  test("streaming sessionization agrees with the batch window-function formulation") {
    implicit val sqlCtx = spark.sqlContext
    // deterministic event stream for users 1..3, gaps at varying offsets
    val events = for {
      u <- 1L to 3L
      i <- 0 until 12
    } yield (u * 100 + i, u, ts((i * 7 + (if (i > 6) 120 else 0)).toInt + u.toInt))
    val batch = Streams.sessionizeBatch(
        events.toDF("event_id", "user_id", "ts"), gapMs = 30 * 60 * 1000L)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    val mem = MemoryStream[SessionEvent]
    val sq = Streams.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000L, "1 minute")
      .writeStream.format("memory").queryName("sess_parity").outputMode("append").start()
    try {
      events.sortBy(_._3.getTime).foreach { case (_, u, t) => mem.addData(SessionEvent(u, t)) }
      sq.processAllAvailable()
      // flush remaining open sessions past the watermark
      mem.addData(SessionEvent(99L, ts(3000)))
      sq.processAllAvailable()
      mem.addData(SessionEvent(99L, ts(3001)))
      sq.processAllAvailable()
      val streamed = spark.table("sess_parity")
        .filter(col("user_id") =!= 99L)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(streamed == batch,
        s"stream/batch divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
    } finally sq.stop()
  }

  test("stateful sessionization runs on the RocksDB state store (the at-scale provider)") {
    // The default HDFS-backed provider keeps every state row on-heap — at
    // 10⁹ live session keys that is the executor memory, not a state
    // store. Spark's RocksDB provider (bundled: rocksdbjni) spills state
    // to local disk with an off-heap block cache; this test pins that the
    // flatMapGroupsWithState operator produces IDENTICAL output under it,
    // so the 100 TB deployment conf is a flip, not a rewrite.
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = for {
        u <- 1L to 3L
        i <- 0 until 8
      } yield (u, ts((i * 7 + (if (i > 4) 90 else 0)).toInt + u.toInt))
      val batch = Streams.sessionizeBatch(
          events.zipWithIndex
            .map { case ((u, t), i) => (i.toLong, u, t) }
            .toDF("event_id", "user_id", "ts"),
          gapMs = 30 * 60 * 1000L)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val mem = MemoryStream[SessionEvent]
      val sq = Streams.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000L, "1 minute")
        .writeStream.format("memory").queryName("sess_rocksdb")
        .outputMode("append").start()
      try {
        events.sortBy(_._2.getTime).foreach { case (u, t) => mem.addData(SessionEvent(u, t)) }
        sq.processAllAvailable()
        // two watermark advances flush the remaining open sessions
        mem.addData(SessionEvent(99L, ts(3000)))
        sq.processAllAvailable()
        mem.addData(SessionEvent(99L, ts(3001)))
        sq.processAllAvailable()
        val streamed = spark.table("sess_rocksdb")
          .filter(col("user_id") =!= 99L)
          .select("user_id", "start_ms", "end_ms", "n_events")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(streamed == batch,
          s"RocksDB-store divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
      } finally sq.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState sessionizer matches batch sessionization " +
      "(timer re-arming, past-gap closure, terminal watermark flush)") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // per user: a 5-event session fed across MULTIPLE micro-batches (the
      // timer must re-arm on every extension), then a past-gap event that
      // closes it (the stale timer for the old horizon fires in a batch
      // where the live session has moved on), then the terminal watermark
      // flush of the last open session
      val events = for {
        u <- 1L to 3L
        i <- 0 until 8
      } yield (u, ts((i * 7 + (if (i > 4) 90 else 0)).toInt + u.toInt))
      val batch = Streams.sessionizeBatch(
          events.zipWithIndex
            .map { case ((u, t), i) => (i.toLong, u, t) }
            .toDF("event_id", "user_id", "ts"),
          gapMs = 30 * 60 * 1000L)
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSet
      val mem = MemoryStream[SessionEvent]
      val sq = Streams.sessionizeStreamTws(mem.toDS(), gapMs = 30 * 60 * 1000L, "1 minute")
        .writeStream.format("memory").queryName("sess_tws")
        .outputMode("append").start()
      try {
        // one event per addData call = one micro-batch per event: every
        // extension exercises deleteTimer + registerTimer across batches
        events.sortBy(_._2.getTime).foreach { case (u, t) => mem.addData(SessionEvent(u, t)) }
        sq.processAllAvailable()
        mem.addData(SessionEvent(99L, ts(3000)))
        sq.processAllAvailable()
        mem.addData(SessionEvent(99L, ts(3001)))
        sq.processAllAvailable()
        val streamed = spark.table("sess_tws")
          .filter(col("user_id") =!= 99L)
          .select("user_id", "start_ms", "end_ms", "n_events")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(streamed == batch,
          s"transformWithState divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
      } finally sq.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("transformWithState migration: batch seeds merge with stream events, " +
      "untouched seeds flush by timer") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val gapMs = 2 * 60 * 1000L // ts(n) is n MINUTES from the epoch base
      // user 1: open seed [0m, 60m] n=3, extended by a stream event at 61m
      // (inside the 2-minute gap) -> one merged session n=4 ending 61m
      // user 2: seed [0m, 30m] n=2, nothing extends it -> flushed by timer
      // user 3: stream-only session
      val seeds = Seq(
        Streams.SessionSeed(1L, ts(0).getTime, ts(60).getTime, 3L),
        Streams.SessionSeed(2L, ts(0).getTime, ts(30).getTime, 2L)).toDS()
      val mem = MemoryStream[SessionEvent]
      val sq = Streams.sessionizeStreamTwsMigrated(mem.toDS(), gapMs, seeds,
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName("sess_mig")
        .outputMode("append").start()
      try {
        mem.addData(SessionEvent(1L, ts(61)), SessionEvent(3L, ts(100)))
        sq.processAllAvailable()
        // far-future events advance the watermark past every open horizon
        mem.addData(SessionEvent(99L, ts(5000)))
        sq.processAllAvailable()
        mem.addData(SessionEvent(99L, ts(5001)))
        sq.processAllAvailable()
        val rows = spark.table("sess_mig")
          .filter(col("user_id") =!= 99L)
          .select("user_id", "start_ms", "end_ms", "n_events")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(rows == Set(
          (1L, ts(0).getTime, ts(61).getTime, 4L),
          (2L, ts(0).getTime, ts(30).getTime, 2L),
          (3L, ts(100).getTime, ts(100).getTime, 1L)),
          s"migration divergence: $rows")
      } finally sq.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("stream-stream fan-in join matches the batch motif on the same transactions") {
    implicit val sqlCtx = spark.sqlContext
    // (ts, sender, beneficiary, amount, txn_id)
    val txns = Seq(
      (ts(0), 1L, 100L, 6000.0, 11L),
      (ts(10), 2L, 100L, 7000.0, 12L),   // pairs with txn 11: 13k > 10k
      (ts(200), 3L, 100L, 9000.0, 13L),  // > 1h from both -> no pair
      (ts(5), 4L, 200L, 2000.0, 14L),
      (ts(6), 5L, 200L, 1000.0, 15L))    // 3k < 10k -> filtered
    val cols = Seq("ts", "sender", "beneficiary", "amount", "txn_id")
    val batch = Streams.fanInPairs(txns.toDF(cols: _*), 10000.0, streaming = false)
      .select("a_id", "b_id", "m_id", "a_txn", "b_txn", "total")
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
    assert(batch == Set((1L, 2L, 100L, 11L, 12L, 13000.0)))

    val mem = MemoryStream[(Timestamp, Long, Long, Double, Long)]
    val sq = Streams.fanInPairs(mem.toDF().toDF(cols: _*), 10000.0)
      .writeStream.format("memory").queryName("fanin").outputMode("append").start()
    try {
      txns.grouped(2).foreach { chunk =>   // arrive across micro-batches
        mem.addData(chunk: _*)
        sq.processAllAvailable()
      }
      val streamed = spark.table("fanin")
        .select("a_id", "b_id", "m_id", "a_txn", "b_txn", "total")
        .as[(Long, Long, Long, Long, Long, Double)].collect().toSet
      assert(streamed == batch,
        s"stream/batch divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
    } finally sq.stop()
  }

  test("streaming dedup agrees with batch dropDuplicates on the same rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (ts(1), 1L, "a"), (ts(1), 1L, "a"),   // exact duplicate
      (ts(2), 1L, "a"),                     // same key, later ts -> kept
      (ts(3), 2L, "b"), (ts(3), 2L, "b"), (ts(3), 2L, "b"))
    val batch = rows.toDF("ts", "doc_id", "text")
      .dropDuplicates(Seq("doc_id", "text", "ts"))
      .select("doc_id", "text").as[(Long, String)].collect().toSeq.sorted

    val mem = MemoryStream[(Timestamp, Long, String)]
    val sq = Streams.dedupStream(
        mem.toDF().toDF("ts", "doc_id", "text"), Seq("doc_id", "text"))
      .writeStream.format("memory").queryName("dedup_parity").outputMode("append").start()
    try {
      mem.addData(rows.take(3): _*)
      sq.processAllAvailable()
      mem.addData(rows.drop(3): _*) // second micro-batch repeats a key
      sq.processAllAvailable()
      val streamed = spark.table("dedup_parity")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq.sorted
      assert(streamed == batch)
    } finally sq.stop()
  }

  test("key-only dedup drops a re-seen key even at a different timestamp") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val sq = Streams.dedupKeysWithinWatermark(
        mem.toDF().toDF("ts", "doc_id", "text"), Seq("doc_id"))
      .writeStream.format("memory").queryName("dedup_keys").outputMode("append").start()
    try {
      // key 1 arrives at ts(1) then again at ts(2): dedupStream would keep
      // both (different event times); key-only dedup must drop the re-crawl
      mem.addData((ts(1), 1L, "a"), (ts(2), 1L, "a-recrawl"), (ts(3), 2L, "b"))
      sq.processAllAvailable()
      mem.addData((ts(4), 2L, "b-recrawl"), (ts(4), 3L, "c")) // across batches too
      sq.processAllAvailable()
      val streamed = spark.table("dedup_keys")
        .select("doc_id", "text").as[(Long, String)].collect().toSeq.sorted
      assert(streamed == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    } finally sq.stop()
  }

  test("session-window aggregation: same plan runs batch and streaming") {
    // user 1: events at 0 and 10 merge (gap 30m), 100 starts a new session
    val rows = Seq((ts(0), 1L), (ts(10), 1L), (ts(100), 1L), (ts(5), 2L))
    val batch = Streams.sessionWindowAgg(rows.toDF("ts", "user_id"), "30 minutes")
      .orderBy("user_id", "start_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(batch.map(r => (r._1, r._4)) == Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    assert(batch.head._3 == batch.head._2 + 10 * 60000L + 30 * 60000L) // end = last + gap

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val sq = Streams.sessionWindowAgg(
        mem.toDF().toDF("ts", "user_id"), "30 minutes", Some("1 hour"))
      .writeStream.format("memory").queryName("sess_win").outputMode("complete").start()
    try {
      mem.addData(rows.take(2): _*)
      sq.processAllAvailable()
      mem.addData(rows.drop(2): _*) // second batch extends/creates sessions
      sq.processAllAvailable()
      val streamed = spark.table("sess_win")
        .orderBy("user_id", "start_ms")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(streamed == batch, s"stream $streamed != batch $batch")
    } finally sq.stop()
  }

  test("fan-in join state is EVICTED once the watermark passes the range") {
    // The minTotal filter references both sides, so Catalyst pushes it
    // into the stream-stream join condition and StreamingJoinHelper WARNs
    // it cannot extract a state constraint from that conjunct. This test
    // pins that the TIME conjuncts still yield the state watermark — old
    // buffered rows must be removed as the watermark advances. If this
    // ever fails, fanInPairs' bounded-state claim is broken and the
    // threshold filter must move out of the streaming plan.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double, Long, Long)]
    val txns = mem.toDF()
      .toDF("sender", "beneficiary", "amount", "txn_id", "ms")
      .withColumn("ts", timestamp_millis(col("ms"))).drop("ms")
    val q = Streams
      .fanInPairs(txns, minTotal = 100.0, within = "1 hour",
        watermark = "1 hour", streaming = true)
      .writeStream.format("memory").queryName("fanin_evict")
      .outputMode("append").start()
    // offsets ride on the 2024 fixture base: epoch-0 rows would be dropped
    // as late against the initial watermark (observed: 4 rows dropped)
    def hr(h: Int): Long = t0 + h * 3600000L
    try {
      mem.addData((1L, 9L, 200.0, 101L, hr(0)), (2L, 9L, 300.0, 102L, hr(0)))
      q.processAllAvailable()
      val afterLoad = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(afterLoad >= 2, s"expected both txns buffered, got $afterLoad")
      // advance the watermark far past hour 0 + within + delay
      Seq(10, 20).foreach { h =>
        mem.addData((50L + h, 999L, 1.0, 900L + h, hr(h)))
        q.processAllAvailable()
      }
      val afterAdvance = q.lastProgress.stateOperators.apply(0).numRowsTotal
      assert(afterAdvance < afterLoad + 2,
        s"state grew without eviction: $afterLoad -> $afterAdvance")
      assert(spark.table("fanin_evict").count() == 1) // the (1,2)->9 pair
    } finally q.stop()
  }

  test("stream-stream left-outer join emits unmatched rows after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[(Timestamp, Long, Long)] // ts, txn_id, user_id
    val cm = MemoryStream[(Timestamp, Long, Long)]
    val sq = Streams.attributionJoin(
        pm.toDF().toDF("ts", "txn_id", "user_id"),
        cm.toDF().toDF("ts", "txn_id", "user_id"),
        within = "2 minutes", watermark = "2 minutes")
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      // user 1: click then purchase inside the window (match);
      // user 2: purchase with no click (must surface null-extended later)
      pm.addData((ts(10), 100L, 1L), (ts(11), 200L, 2L))
      cm.addData((ts(9), 900L, 1L))
      sq.processAllAvailable()
      // advance both watermarks far past user 2's match window
      pm.addData((ts(200), 300L, 3L))
      cm.addData((ts(200), 901L, 3L))
      sq.processAllAvailable()
      val rows = spark.table("attr")
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows.contains((100L, 900L)), s"matched pair missing: $rows")
      assert(rows.contains((200L, -1L)),
        s"unmatched purchase not emitted after watermark: $rows")
    } finally sq.stop()
  }

  test("stream-stream FULL outer join also emits never-attributed clicks " +
      "null-extended after the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val pm = MemoryStream[(Timestamp, Long, Long)] // ts, txn_id, user_id
    val cm = MemoryStream[(Timestamp, Long, Long)]
    val sq = Streams.attributionJoin(
        pm.toDF().toDF("ts", "txn_id", "user_id"),
        cm.toDF().toDF("ts", "txn_id", "user_id"),
        within = "2 minutes", watermark = "2 minutes",
        joinType = "full_outer")
      .writeStream.format("memory").queryName("attr_fo").outputMode("append").start()
    try {
      // user 1: click+purchase match; user 2: purchase with no click;
      // user 4: click with no purchase (the full-outer-only emission)
      pm.addData((ts(10), 100L, 1L), (ts(11), 200L, 2L))
      cm.addData((ts(9), 900L, 1L), (ts(10), 902L, 4L))
      sq.processAllAvailable()
      pm.addData((ts(200), 300L, 3L))
      cm.addData((ts(200), 901L, 3L))
      sq.processAllAvailable()
      val rows = spark.table("attr_fo")
        .select("user_id", "purchase_id", "click_id")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1),
          if (r.isNullAt(2)) -1L else r.getLong(2)))
        .toSet
      assert(rows.contains((1L, 100L, 900L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, 200L, -1L)),
        s"unmatched purchase not emitted: $rows")
      assert(rows.contains((4L, -1L, 902L)),
        s"unmatched click not emitted (user_id must coalesce from the click side): $rows")
    } finally sq.stop()
  }

  test("incremental CC sink over a stream of edges matches batch CC on all edges") {
    implicit val sqlCtx = spark.sqlContext
    val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L), (4L, 10L))
    val sink = new Streams.IncrementalCCSink()
    val mem = MemoryStream[(Long, Long)]
    val sq = mem.toDF().toDF("src", "dst")
      .writeStream.foreachBatch(sink.update _).start()
    try {
      all.grouped(2).foreach { chunk =>
        mem.addData(chunk: _*)
        sq.processAllAvailable()
      }
      val streamed = sink.current.get
        .select("id", "component").as[(Long, Long)].collect().toSet
      val batch = graft.graph.ConnectedComponents
        .runOnEdges(all.toDF("src", "dst"))
        .select("id", "component").as[(Long, Long)].collect().toSet
      assert(streamed == batch)
      // every edge eventually bridges: one component rooted at the global min
      assert(streamed.map(_._2) == Set(1L))
    } finally sq.stop()
  }

  test("incremental CC sink restarts from its state dir, exactly-once over replay") {
    // the custom-sink twin of the checkpoint-restart test: the built-in
    // state store recovers via the offset/state logs, but a foreachBatch
    // sink owns its own state — with stateDir set, the assignment must
    // survive a new sink instance (a restarted job) and a re-delivered
    // micro-batch (foreachBatch's at-least-once contract) must not be
    // folded twice
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft_ccsink_").toString
    val src = s"$tmp/src"; val ckpt = s"$tmp/ckpt"; val state = s"$tmp/state"
    Files.createDirectories(java.nio.file.Paths.get(src))
    val all = Seq((1L, 2L), (3L, 4L), (2L, 3L), (10L, 11L), (4L, 10L))
    def edgesDf(s: Seq[(Long, Long)]) = s.toDF("src", "dst")

    def runLifecycle(sink: Streams.IncrementalCCSink): Unit = {
      val sq = spark.readStream.schema(edgesDf(all).schema)
        .option("maxFilesPerTrigger", "1").parquet(src)
        .writeStream
        .foreachBatch((b: org.apache.spark.sql.DataFrame, id: Long) =>
          sink.update(b, id))
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
    }

    // lifecycle 1: first three edges in two files
    edgesDf(all.take(2)).coalesce(1).write.mode("append").parquet(src)
    edgesDf(all.slice(2, 3)).coalesce(1).write.mode("append").parquet(src)
    val sink1 = new Streams.IncrementalCCSink(stateDir = Some(state))
    runLifecycle(sink1)
    val mid = sink1.current.get.as[(Long, Long)].collect().toSet
    assert(mid.map(_._2) == Set(1L), s"1-2-3-4 should be one component: $mid")

    // replayed micro-batch (same id as the last committed) must be a no-op
    // even with DIFFERENT rows — the skip is by id, per the engine contract
    sink1.update(edgesDf(Seq((777L, 778L))), 1L)
    assert(sink1.current.get.as[(Long, Long)].collect().toSet == mid,
      "replayed batchId was folded twice")

    // lifecycle 2: a RESTARTED job — fresh sink instance over the same
    // state dir + stream checkpoint; the remaining edges arrive
    edgesDf(all.drop(3)).coalesce(1).write.mode("append").parquet(src)
    val sink2 = new Streams.IncrementalCCSink(stateDir = Some(state))
    assert(sink2.currentOrRestore(spark).get
      .as[(Long, Long)].collect().toSet == mid, "state not restored")
    runLifecycle(sink2)
    val streamed = sink2.current.get.as[(Long, Long)].collect().toSet
    val batch = graft.graph.ConnectedComponents
      .runOnEdges(edgesDf(all))
      .select("id", "component").as[(Long, Long)].collect().toSet
    assert(streamed == batch,
      s"restart divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("delta-commit CC sink: O(batch) commits between snapshots, restart folds snapshot + deltas") {
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft_ccsink_delta_").toString
    // snapshotEvery=3: batch 0 = first-ever commit -> full assign-0;
    // batch 1 repeats an edge -> EMPTY delta-1; batch 2 -> delta-2
    val batches = Seq(
      Seq((1L, 2L)),
      Seq((1L, 2L)), // all-unchanged batch -> EMPTY delta dir
      Seq((3L, 4L)),
      Seq((2L, 3L)), // merges 3-4 into component 1
      Seq((10L, 11L), (4L, 10L))) // merges 10-11 into component 1
    val sink1 = new Streams.IncrementalCCSink(
      stateDir = Some(state), snapshotEvery = 3)
    batches.take(3).zipWithIndex.foreach { case (b, i) =>
      sink1.update(b.toDF("src", "dst"), i.toLong)
    }
    def names(prefix: String) = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith(prefix)).sorted.toSeq
    assert(names("assign-") == Seq("assign-0"), s"snapshots: ${names("assign-")}")
    assert(names("delta-") == Seq("delta-1", "delta-2"),
      s"deltas: ${names("delta-")}")

    // restart: fresh sink must fold assign-0 + delta-1 (an EMPTY dir) +
    // delta-2, then resume exactly-once past batchId 2
    val sink2 = new Streams.IncrementalCCSink(
      stateDir = Some(state), snapshotEvery = 3)
    val mid = sink2.currentOrRestore(spark).get
      .as[(Long, Long)].collect().toSet
    assert(mid == Set(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L), s"restored: $mid")
    sink2.update(batches(2).toDF("src", "dst"), 2L) // replay: must be a no-op
    assert(sink2.current.get.as[(Long, Long)].collect().toSet == mid,
      "replayed batchId was folded twice")
    // batch 3 is the 3rd commit since assign-0 -> full snapshot; batch 4 -> delta
    sink2.update(batches(3).toDF("src", "dst"), 3L)
    sink2.update(batches(4).toDF("src", "dst"), 4L)
    val fin = sink2.current.get.as[(Long, Long)].collect().toSet
    val batchCc = graft.graph.ConnectedComponents
      .runOnEdges(batches.flatten.toDF("src", "dst"))
      .as[(Long, Long)].collect().toSet
    assert(fin == batchCc,
      s"delta restart divergence: missing=${batchCc -- fin} extra=${fin -- batchCc}")
    assert(names("assign-") == Seq("assign-0", "assign-3"),
      s"snapshots: ${names("assign-")}")
    assert(names("delta-").contains("delta-4"), s"deltas: ${names("delta-")}")
    graft.engine.Fs.deleteRecursively(new java.io.File(state))
  }

  test("delta-commit pruning keeps every retained snapshot roll-forward-able") {
    import java.nio.file.Files
    val state = Files.createTempDirectory("graft_ccsink_prune_").toString
    val sink = new Streams.IncrementalCCSink(
      stateDir = Some(state), keepCommits = 2, snapshotEvery = 2)
    // 8 batches, each a fresh component: snapshots at 0,2,4,6 (prune keeps
    // 4 and 6), deltas at 1,3,5,7 (prune keeps those newer than snapshot 4)
    (0 until 8).foreach { i =>
      val b = 100L * (i + 1)
      sink.update(Seq((b, b + 1)).toDF("src", "dst"), i.toLong)
    }
    def names(prefix: String) = new java.io.File(state).listFiles()
      .map(_.getName).filter(_.startsWith(prefix)).sorted.toSeq
    assert(names("assign-") == Seq("assign-4", "assign-6"),
      s"snapshots: ${names("assign-")}")
    assert(names("delta-") == Seq("delta-5", "delta-7"),
      s"deltas: ${names("delta-")}")
    // a fresh sink over the pruned dir restores the full 8-batch state
    val restored = new Streams.IncrementalCCSink(
        stateDir = Some(state), snapshotEvery = 2)
      .currentOrRestore(spark).get.as[(Long, Long)].collect().toSet
    val expect = (0 until 8).flatMap { i =>
      val b = 100L * (i + 1); Seq(b -> b, (b + 1) -> b)
    }.toSet
    assert(restored == expect,
      s"pruned restore divergence: missing=${expect -- restored} extra=${restored -- expect}")
    graft.engine.Fs.deleteRecursively(new java.io.File(state))
  }

  test("streaming sessionization closes sessions on gap or watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val sq = Streams.sessionizeStream(mem.toDS(), gapMs = 30 * 60 * 1000L, "10 minutes")
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData(SessionEvent(10L, ts(0)), SessionEvent(10L, ts(10)))
      sq.processAllAvailable()
      // session still open (no gap, watermark not past timeout)
      assert(spark.table("sessions").isEmpty)
      // an event past the gap closes the first session explicitly
      mem.addData(SessionEvent(10L, ts(60)))
      sq.processAllAvailable()
      val closed = spark.table("sessions")
        .select("user_id", "start_ms", "end_ms", "n_events")
        .as[(Long, Long, Long, Long)].collect().toSeq
      assert(closed == Seq((10L, ts(0).getTime, ts(10).getTime, 2L)))
      // advancing the watermark far past end+gap times out the open session
      mem.addData(SessionEvent(99L, ts(600)))
      sq.processAllAvailable()
      mem.addData(SessionEvent(99L, ts(601)))
      sq.processAllAvailable()
      val all = spark.table("sessions").select("user_id").as[Long].collect().toSet
      assert(all.contains(10L))
      assert(spark.table("sessions").count() >= 2)
    } finally sq.stop()
  }

  test("stateless curation operators run unchanged on a stream") {
    // hashSplit / redactPii / langId are pure projections, so the SAME
    // operator code curates a live document stream (the batch/stream parity
    // Structured Streaming promises for stateless plans) — documents arrive,
    // get split + scrubbed + language-tagged per micro-batch
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val curated = graft.ext.Sampling
      .hashSplit(mem.toDF().toDF("doc_id", "text"), "doc_id", seed = 7)
      .withColumn("clean", graft.ext.TextAnalysis.redactPii(col("text")))
      .withColumn("lang", graft.ext.TextAnalysis.langId(col("text")))
      .select("doc_id", "split", "clean", "lang")
    val sq = curated.writeStream.format("memory").queryName("curated")
      .outputMode("append").start()
    try {
      mem.addData((1L, "the cat of a dog is here mail me a@b.io"),
        (2L, "el perro y la casa de que"))
      sq.processAllAvailable()
      val got = spark.table("curated")
        .as[(Long, String, String, String)].collect().sortBy(_._1)
      assert(got.length == 2)
      assert(got(0)._3.endsWith("mail me <EMAIL>") && got(0)._4 == "en")
      assert(got(1)._4 == "es")
      // streamed split equals the batch split for the same ids (stability)
      val batchSplit = graft.ext.Sampling
        .hashSplit(Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text"), "doc_id", seed = 7)
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      got.foreach(r => assert(r._2 == batchSplit(r._1)))
    } finally sq.stop()
  }

  test("foreachBatch upsert sink lands micro-batches in a managed table idempotently") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("graft_stream_upsert").toString
    val cat = new graft.engine.Catalog(spark, wh)
    cat.save("stream_state", Seq((0L, "init")).toDF("id", "v"))
    val mem = MemoryStream[(Long, String)]
    val sq = mem.toDF().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        cat.upsert("stream_state", batch, Seq("id"))
      }
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      sq.processAllAvailable()
      // at-least-once delivery: the same rows arrive again in a later
      // micro-batch — keyed upsert makes the sink idempotent
      mem.addData((1L, "a"), (2L, "b2"))
      sq.processAllAvailable()
      val state = cat.table("stream_state").as[(Long, String)].collect().toMap
      assert(state == Map(0L -> "init", 1L -> "a", 2L -> "b2"))
    } finally sq.stop()
  }

  test("streaming anomaly scores match the batch rolling z-score exactly") {
    import graft.streaming.Streams.ValueEvent
    implicit val sqlCtx = spark.sqlContext
    // two users: a stable series with planted spikes, plus a quiet one
    val rnd = new scala.util.Random(7)
    val rows = (1 to 40).map { i =>
      val v =
        if (i == 25 || i == 37) 900.0 else 50.0 + rnd.nextInt(10)
      ValueEvent(1L, i.toLong, ts(i), v)
    } ++ (1 to 12).map(i => ValueEvent(2L, 100L + i, ts(i), 5.0 + (i % 3)))
    val batch = graft.ext.TimeSeries
      .rollingZScore(rows.toDF(), lookback = 16, minObs = 8, threshold = 2.5)
      .select("user_id", "event_id", "value", "z")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(batch.exists(_._2 == 25L) && batch.exists(_._2 == 37L))

    val mem = MemoryStream[ValueEvent]
    val sq = Streams.anomalyStream(mem.toDS(), lookback = 16, minObs = 8,
        threshold = 2.5)
      .writeStream.format("memory").queryName("anomaly_parity")
      .outputMode("append").start()
    try {
      // in-order arrival split across micro-batches (state carries over)
      rows.sortBy(e => (e.ts.getTime, e.event_id)).grouped(7).foreach { c =>
        mem.addData(c: _*); sq.processAllAvailable()
      }
      val streamed = spark.table("anomaly_parity")
        .as[(Long, Long, Double, Double)].collect().toSet
      assert(streamed == batch,
        s"divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
    } finally sq.stop()
  }

  test("transformWithState anomaly (ListState) matches the batch rolling " +
      "z-score: append path while filling, rewrite path once full") {
    import graft.streaming.Streams.ValueEvent
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rnd = new scala.util.Random(7)
      // user 1 crosses lookback=16 (exercises the truncating put rewrite);
      // user 2 stays below it (pure appendValue path)
      val rows = (1 to 40).map { i =>
        val v = if (i == 25 || i == 37) 900.0 else 50.0 + rnd.nextInt(10)
        ValueEvent(1L, i.toLong, ts(i), v)
      } ++ (1 to 12).map(i => ValueEvent(2L, 100L + i, ts(i), 5.0 + (i % 3)))
      val batch = graft.ext.TimeSeries
        .rollingZScore(rows.toDF(), lookback = 16, minObs = 8, threshold = 2.5)
        .select("user_id", "event_id", "value", "z")
        .as[(Long, Long, Double, Double)].collect().toSet
      val mem = MemoryStream[ValueEvent]
      val sq = Streams.anomalyStreamTws(mem.toDS(), lookback = 16, minObs = 8,
          threshold = 2.5)
        .writeStream.format("memory").queryName("anomaly_tws_parity")
        .outputMode("append").start()
      try {
        rows.sortBy(e => (e.ts.getTime, e.event_id)).grouped(7).foreach { c =>
          mem.addData(c: _*); sq.processAllAvailable()
        }
        val streamed = spark.table("anomaly_tws_parity")
          .as[(Long, Long, Double, Double)].collect().toSet
        assert(streamed == batch,
          s"divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
      } finally sq.stop()
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("streaming heavy hitters: sketch state in the store, batch parity") {
    // skewed stream: 'hot' dominates both windows; ≤ 6 distinct types per
    // window < k=8, so the sketch never evicts and its counts are EXACT —
    // merge-order-independent, which makes batch/stream parity a strict
    // equality (under eviction count_lb is a merge-order-dependent lower
    // bound; q73 gates that case via the guaranteed-heavy subset instead)
    val rows = (0 until 200).map { i =>
      val t = ts(i % 110)
      val ty = if (i % 3 != 0) "hot" else s"cold${i % 5}"
      (t, ty, 1.0)
    }
    val batchDf = rows.toDF("ts", "event_type", "value")
    val batch = Streams.heavyHittersStream(batchDf, k = 8, watermark = None)
      .as[(Long, String, Long)].collect().toSet
    assert(batch.exists(_._2 == "hot"), "heavy item missing from batch twin")

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val sq = Streams.heavyHittersStream(
        mem.toDF().toDF("ts", "event_type", "value"), k = 8)
      .writeStream.format("memory").queryName("hh_parity")
      .outputMode("complete").start()
    try {
      rows.grouped(23).foreach { c => mem.addData(c: _*); sq.processAllAvailable() }
      val streamed = spark.table("hh_parity")
        .as[(Long, String, Long)].collect().toSet
      assert(streamed == batch,
        s"divergence: missing=${batch -- streamed} extra=${streamed -- batch}")
    } finally sq.stop()
  }

  test("transformWithState heavy hitters (MapState): exact counts below " +
      "capacity, guaranteed-heavy retained under eviction") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // same skewed fixture as the aggregate twin: at k=8 nothing evicts
      // and the final sketch must equal exact counts; at k=2 the MG merge
      // evicts, and 'hot' (majority in every window) must survive
      val rows = (0 until 200).map { i =>
        val t = ts(i % 110)
        val ty = if (i % 3 != 0) "hot" else s"cold${i % 5}"
        (t, ty, 1.0)
      }
      val exact = Streams.heavyHittersStream(
          rows.toDF("ts", "event_type", "value"), k = 8, watermark = None)
        .as[(Long, String, Long)].collect().toSet
      def run(k: Int, name: String): Set[(Long, String, Long)] = {
        val mem = MemoryStream[(Timestamp, String, Double)]
        val sq = Streams.heavyHittersStreamTws(
            mem.toDF().toDF("ts", "event_type", "value"), k)
          .toDF().writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          rows.grouped(23).foreach { c => mem.addData(c: _*); sq.processAllAvailable() }
          import org.apache.spark.sql.expressions.Window
          spark.table(name)
            .withColumn("__mv", max("ver").over(Window.partitionBy("start_ms")))
            .where(col("ver") === col("__mv"))
            .select("start_ms", "item", "count_lb")
            .as[(Long, String, Long)].collect().toSet
        } finally sq.stop()
      }
      val noEvict = run(8, "hh_tws_exact")
      assert(noEvict == exact,
        s"k=8 sketch != exact: missing=${exact -- noEvict} extra=${noEvict -- exact}")
      val evicted = run(2, "hh_tws_evict")
      val hotWindows = exact.filter(_._2 == "hot").map(_._1)
      val retainedHot = evicted.filter(_._2 == "hot").map(_._1)
      assert(hotWindows.subsetOf(retainedHot),
        s"majority item evicted from windows ${hotWindows -- retainedHot}")
      // lower-bound property: no count exceeds the exact count
      val exactMap = exact.map(e => (e._1, e._2) -> e._3).toMap
      evicted.foreach { case (w, i, c) =>
        assert(c <= exactMap.getOrElse((w, i), 0L),
          s"count_lb $c exceeds exact for ($w, $i)")
      }
    } finally saved match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("restart recovery: stateful stream resumes from a filesystem checkpoint exactly-once") {
    // The state-store RECOVERY path a production stream exercises on every
    // deploy, which no other test drives: run a stateful sessionization
    // over PART of the input with a filesystem checkpointLocation +
    // durable file sink, let AvailableNow terminate, append more input
    // files, REBUILD the whole pipeline (as a restarted job would) against
    // the same checkpoint, and run again. The offset log must skip the
    // already-processed files (a replay would double-emit run 1's
    // sessions into the append-only sink) and the state store must reload
    // the open-session state version (a loss would split every
    // boundary-spanning session in two). Both failure modes land in the
    // terminal file-sink contents, which are asserted against the batch
    // twin over ALL input.
    import java.nio.file.{Files, Paths}
    val tmp = Files.createTempDirectory("graft_restart_").toString
    val srcDir = s"$tmp/src"; val ckpt = s"$tmp/ckpt"; val outDir = s"$tmp/out"
    Files.createDirectories(Paths.get(srcDir))

    val gapMs = 30 * 60 * 1000L
    // per user u in 1..4 (minutes, offset by u to decorrelate users):
    //   part 1: 0,7,14  = session A (closed by the 60-min event in run 1)
    //           60,67   = session B, OPEN at the end of run 1
    //   part 2: 80,87   = session B continues (13 min < gap: SPANS restart)
    //           150     = session C (open forever — never emitted)
    // watermark delay 2 h > the part-1 span, so nothing times out in run 1
    // and emission is purely closed-by-later-event — the batch twin is
    // "every session except each user's last".
    def mkEvents(minutes: Seq[Int]) =
      (for { u <- 1L to 4L; m <- minutes } yield (u, ts(m + u.toInt)))
        .toDF("user_id", "ts")
    val part1 = Seq(0, 7, 14, 60, 67)
    val part2 = Seq(80, 87, 150)

    def runOnce(): Unit = {
      val sq = Streams.sessionizeStream(
          spark.readStream
            .schema(mkEvents(part1).schema).parquet(srcDir)
            .as[SessionEvent],
          gapMs = gapMs, watermarkDelay = "2 hours")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
    }
    def sunk(): Set[(Long, Long, Long, Long)] = spark.read.parquet(outDir)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet

    mkEvents(part1).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce()
    val afterRun1 = sunk()
    // run 1 emits exactly the four closed A-sessions (3 events each)
    assert(afterRun1.size == 4 && afterRun1.forall(_._4 == 3L),
      s"run 1 emitted $afterRun1")

    mkEvents(part2).coalesce(1).write.mode("append").parquet(srcDir)
    runOnce() // fresh pipeline, same checkpoint: the recovery path
    val terminal = sunk()

    // batch twin over ALL input: every session except each user's last
    val allDf = mkEvents(part1 ++ part2)
      .withColumn("event_id", col("user_id") * 1000 + unix_millis(col("ts")))
    val twin = Streams.sessionizeBatch(allDf, gapMs)
      .withColumn("last_sid",
        max(col("sid")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("user_id")))
      .where(col("sid") < col("last_sid"))
      .select("user_id", "start_ms", "end_ms", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(terminal == twin,
      s"restart divergence: missing=${twin -- terminal} extra=${terminal -- twin}")

    // run 1's rows survived unduplicated (an offset replay would re-emit
    // them as duplicate files in the sink's commit log)
    assert(afterRun1.subsetOf(terminal))
    val totalRows = spark.read.parquet(outDir).count()
    assert(totalRows == terminal.size.toLong,
      s"duplicate emissions: $totalRows physical rows, ${terminal.size} distinct")
    // the boundary-spanning B-sessions carry events from BOTH runs: state
    // was genuinely reloaded (a lost store would emit (80,87) pairs of 2)
    val bSessions = terminal -- afterRun1
    assert(bSessions.size == 4 && bSessions.forall(_._4 == 4L),
      s"boundary sessions wrong (state not recovered?): $bSessions")
  }
}
