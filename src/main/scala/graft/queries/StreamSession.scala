package graft.queries

import org.apache.spark.sql.SparkSession

import graft.engine.Tables

/** Shared stream-session scoping for the streaming-contract queries
  * (q168/q171/q173/q174/q175 in [[ExtQueries]], q177 in [[GraphQueries]]).
  *
  * Runs `body` against a FRESH session (`spark.newSession()` — shared
  * SparkContext and catalog, session-scoped SQL conf and temp views)
  * whose `spark.sql.shuffle.partitions` is sized for STREAM STATE. A
  * streaming query freezes its shuffle-partition count into the state
  * checkpoint at FIRST start (it can never change across restarts — every
  * state store lives per partition forever), so unlike batch it must be a
  * deliberate choice sized to expected state volume, not inherited from
  * the batch default: at the contract SFs, 32 partitions mean 32 (×2 per
  * stream-stream join side) state-store lifecycles per micro-batch for
  * kilobytes of state — measured 12.4 s → 4.4 s on q175 and 2.7 s → 1.4 s
  * on q168 at 4 partitions. Default 8 keeps real parallelism; a large
  * deployment sets SPARK_GRAFT_STREAM_PARTITIONS to match its key
  * cardinality.
  *
  * Session-scoped conf means no lock, no set/restore race, and ZERO
  * visibility to the batch queries Verify plans concurrently on its
  * thread pool (the shared-session wrapper this replaced serialized
  * stream-vs-stream but still planned concurrent BATCH queries at the
  * stream's partition count while a stream held the conf). The memory
  * sink's temp view registers in the session that starts the stream, so
  * `body` receives the stream session and must do ALL its work there —
  * readStream, start, and the terminal sink-table read; a fresh session
  * per run also means no stale sink view from a previous Bench pass.
  *
  * Runtime confs do not carry into a new session (its SQLConf initializes
  * from the SparkContext conf), so the PARENT's runtime confs are copied
  * over first — the isolation this wrapper wants is outward (our
  * partition override invisible to batch queries), not inward: a harness
  * arm conf (QTime `conf:` A/Bs) set on the parent session must reach the
  * stream it measures. Static/non-settable entries are skipped. The
  * stream-state partition override is applied LAST so it wins. */
private[queries] object StreamSession {
  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Conf keys the most recent [[apply]] could NOT copy into the stream
    * session (static / non-settable entries). Visible — logged once per
    * session build and exposed for the spec — instead of silently
    * swallowed, so a future non-settable-conf CATEGORY (not just the known
    * static set) cannot hide a conf that a harness arm believed it had
    * propagated. */
  @volatile private[graft] var lastSkippedConfs: Seq[String] = Nil

  def apply[T](s: SparkSession)(body: SparkSession => T): T = {
    val ss = s.newSession()
    val skipped = Seq.newBuilder[String]
    s.conf.getAll.foreach { case (k, v) =>
      if (!ss.conf.getOption(k).contains(v))
        try ss.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => skipped += k }
    }
    lastSkippedConfs = skipped.result()
    if (lastSkippedConfs.nonEmpty)
      log.info("StreamSession: skipped non-settable confs: {}",
        lastSkippedConfs.mkString(", "))
    Tables.ensureNanosConf(ss)
    ss.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"))
    body(ss)
  }
}
