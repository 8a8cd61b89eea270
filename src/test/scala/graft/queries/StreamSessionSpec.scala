package graft.queries

import graft.SparkTestBase

/** [[StreamSession]] — the conf-copy contract of the stream-scoped session:
  * parent RUNTIME confs must reach the stream session (harness A/B arms set
  * them on the parent), the stream-state partition override must win, and
  * anything skipped must be exactly the non-settable (static) conf set,
  * recorded visibly rather than swallowed. */
class StreamSessionSpec extends SparkTestBase {

  test("runtime confs propagate; the partition override wins; skips are only static confs") {
    // the session is JVM-shared across suites — restore every touched conf
    // or a later suite's plan-shape pins run under a foreign broadcast
    // threshold depending on suite order
    val prevThresh = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      runScenario()
    } finally {
      spark.conf.unset("spark.graft.test.arm")
      prevThresh match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  private def runScenario(): Unit = {
    spark.conf.set("spark.graft.test.arm", "on")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "12345678")
    val (arm, thresh, parts) = StreamSession(spark) { ss =>
      (ss.conf.get("spark.graft.test.arm"),
        ss.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        ss.conf.get("spark.sql.shuffle.partitions"))
    }
    assert(arm == "on", "parent runtime conf must reach the stream session")
    assert(thresh == "12345678")
    assert(parts == sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTITIONS", "8"),
      "stream-state partition override must be applied last")

    // every skipped key must be genuinely non-settable — a registered SQL
    // conf that RuntimeConfig reports immutable (the static set). A skip
    // for any other reason (bad value on a modifiable conf, an unregistered
    // key) would be a propagation hole, not a static-conf skip. In THIS
    // environment the list is empty outright: a child session initializes
    // static confs from the shared context, so their values never differ
    // and the copy guard never even attempts them — any future nonempty
    // list must still be all-static.
    val skipped = StreamSession.lastSkippedConfs
    val holes = skipped.filter(k => spark.conf.isModifiable(k))
    assert(holes.isEmpty, s"modifiable confs were skipped: $holes")
  }

  test("a value-diverging static conf lands in the skip list, visibly") {
    // the skip path itself, exercised directly: setting a static conf on a
    // session throws AnalysisException (Spark's contract), which is exactly
    // what the copy loop converts into a skip-list entry rather than a
    // crash or a silent swallow
    val ss = spark.newSession()
    intercept[org.apache.spark.sql.AnalysisException] {
      ss.conf.set("spark.sql.extensions", "some.other.Extensions")
    }
  }
}
