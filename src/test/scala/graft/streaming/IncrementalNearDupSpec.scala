package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.TextDedup

class IncrementalNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val alpha = "alpha beta gamma delta epsilon zeta"
  private val omega = "omega psi chi phi upsilon tau"
  private val kappa = "kappa lambda mu nu xi omicron"
  private val sigma = "sigma rho pi theta eta iota"

  private def runBatches(batches: Seq[Seq[(Long, String)]]): IncrementalNearDupSink = {
    implicit val sqlCtx = spark.sqlContext
    val sink = new IncrementalNearDupSink("doc_id", "text",
      n = 3, numPerm = 16, bands = 4, threshold = 0.5)
    val mem = MemoryStream[(Long, String)]
    val sq = mem.toDF().toDF("doc_id", "text")
      .writeStream.foreachBatch(sink.update _).start()
    try {
      batches.foreach { b => mem.addData(b: _*); sq.processAllAvailable() }
    } finally sq.stop()
    sink
  }

  test("cross-batch clones dup to the first-seen keeper; keepers accumulate") {
    val sink = runBatches(Seq(
      Seq(1L -> alpha, 2L -> omega),
      Seq(3L -> alpha, 4L -> kappa),
      Seq(5L -> alpha, 6L -> kappa, 7L -> sigma)))
    val verdicts = sink.verdicts.get
      .select("id", "dup_of").as[(Long, Option[Long])].collect().toMap
    assert(verdicts == Map(
      1L -> None, 2L -> None, 3L -> Some(1L), 4L -> None,
      5L -> Some(1L), 6L -> Some(4L), 7L -> None))
    assert(sink.keeperIds.get.as[Long].collect().toSet == Set(1L, 2L, 4L, 7L))
  }

  test("batch-internal clones resolve through chain candidates + components") {
    val sink = runBatches(Seq(
      Seq(10L -> alpha, 11L -> alpha, 12L -> alpha, 13L -> omega)))
    val verdicts = sink.verdicts.get
      .select("id", "dup_of").as[(Long, Option[Long])].collect().toMap
    assert(verdicts == Map(
      10L -> None, 11L -> Some(10L), 12L -> Some(10L), 13L -> None))
  }

  test("streaming keepers match batch dedupClusters under min-id quality") {
    val rows = Seq(1L -> alpha, 2L -> omega, 3L -> alpha, 4L -> kappa,
      5L -> alpha, 6L -> kappa, 7L -> sigma, 8L -> omega)
    val sink = runBatches(rows.grouped(3).toSeq)
    val streamed = sink.keeperIds.get.as[Long].collect().toSet

    // batch twin: quality = -id makes "best quality" = first seen (min id),
    // the only ordering an online first-seen-wins sink can reproduce
    val docs = rows.toDF("doc_id", "text")
    val quality = docs.select(col("doc_id").as("id"), (-col("doc_id")).as("quality"))
    val batch = TextDedup.dedupClusters(docs, "doc_id", "text", quality,
        n = 3, numPerm = 16, bands = 4, threshold = 0.5)
      .where(!col("is_dropped")).select("id").as[Long].collect().toSet
    assert(streamed == batch)
  }

  test("short documents (< n words) are singleton keepers, never dropped") {
    val sink = runBatches(Seq(Seq(20L -> "tiny", 21L -> "tiny", 22L -> alpha)))
    val verdicts = sink.verdicts.get
      .select("id", "dup_of").as[(Long, Option[Long])].collect().toMap
    // identical "tiny" texts cannot shingle at n=3, so near-dup (correctly)
    // has no signal — exact dedup is the operator for that tier
    assert(verdicts == Map(20L -> None, 21L -> None, 22L -> None))
  }
}
