package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.TextDedup
import graft.graph.ConnectedComponents

/** Incremental near-duplicate dedup as a streaming sink — the
  * continuous-ingestion twin of [[graft.ext.TextDedup.dedupClusters]]
  * (which itself extends the reference's batch dedup surface,
  * `/root/reference/03_aml_entity_resolution.py:24-68`, to content
  * near-dup). Each micro-batch of `(id, text)` documents is checked against
  * the accumulated *kept* corpus:
  *
  *  1. MinHash-band the batch once ([[TextDedup.minhashBuckets]]).
  *  2. Candidates = batch-vs-kept `(band, bucket)` collisions (equi-join
  *     against the bucket store — the store never re-hashes) plus
  *     batch-internal consecutive-by-id chain candidates
  *     ([[TextDedup.chainCandidates]] — linear under clone skew).
  *  3. Verify candidates by exact shingle-Jaccard over the shared shingle
  *     store ([[TextDedup.jaccardFromCounts]]) — candidates only, never
  *     O(n²).
  *  4. Resolve batch clusters with min-id connected components over the
  *     verified edges; a cluster that touches ANY kept document dups to the
  *     minimum such keeper, otherwise its minimum-id batch member becomes a
  *     new keeper.
  *
  * Only keepers enter the stores, so state grows with the *distinct*
  * corpus, not the stream; every store is `localCheckpoint`ed per batch, so
  * lineage never grows with batch count (the [[Streams.IncrementalCCSink]]
  * discipline). At 100 TB-ingest scale the stores are the natural
  * bucketed-table shape: both store joins are equi-joins on `(band,
  * bucket)` / `(id, sh)` keys.
  *
  * Use with `docs.writeStream.foreachBatch(sink.update _)`; read
  * [[verdicts]] (`id, dup_of`) or [[keeperIds]] between/after batches.
  * First-seen-wins (a later clone dups to the earlier keeper) — the
  * batch-side `dedupClusters` instead keeps the best-quality member, which
  * a replay can't know online; parity on min-id ordering is asserted in
  * IncrementalNearDupSpec. */
final class IncrementalNearDupSink(idCol: String, textCol: String,
    n: Int, numPerm: Int, bands: Int, threshold: Double,
    mode: TextDedup.MinHashMode = TextDedup.XxMode) {

  @volatile private var shKept: Option[DataFrame] = None // (id, sh)
  @volatile private var bkKept: Option[DataFrame] = None // (id, band, bucket)
  @volatile private var acc: Option[DataFrame] = None // (id, dup_of)

  /** Accumulated `(id, dup_of)` verdicts — `dup_of` null for keepers
    * (None before the first batch). */
  def verdicts: Option[DataFrame] = acc

  /** Ids of the kept (deduplicated) corpus so far. */
  def keeperIds: Option[DataFrame] =
    acc.map(_.where(col("dup_of").isNull).select("id"))

  def update(batch0: DataFrame, batchId: Long): Unit = synchronized {
    val batch = batch0.select(col(idCol).as("id"), col(textCol).as("text"))
      .dropDuplicates("id").localCheckpoint()
    val (shB, bkB0) = TextDedup.minhashBuckets(batch, "id", "text", n, numPerm, bands, mode)
    val bkB = bkB0.localCheckpoint()

    // candidate edges: store collisions (kept id on the left) + batch chain
    val storeCands = bkKept match {
      case Some(bk) => bkB.as("nb").join(bk.as("kb"),
          col("nb.band") === col("kb.band") && col("nb.bucket") === col("kb.bucket"))
        .select(col("kb.id").as("id_l"), col("nb.id").as("id_r"))
        .dropDuplicates("id_l", "id_r")
      case None => batch.sparkSession.emptyDataFrame
        .withColumn("id_l", lit(null).cast(batch.schema("id").dataType))
        .withColumn("id_r", lit(null).cast(batch.schema("id").dataType))
        .limit(0)
    }
    val cands = storeCands.unionByName(TextDedup.chainCandidates(bkB))
      .dropDuplicates("id_l", "id_r")
    val shAll = shKept.map(_.unionByName(shB)).getOrElse(shB)
    // verification touches only candidate documents, so filter the shingle
    // store to candidate ids FIRST: the per-pair size lookups and both
    // (id, sh) probe joins then run over O(candidates) rows instead of
    // scanning the whole accumulated store three times per micro-batch
    // (sizes aggregate + two verification joins) — the per-batch cost
    // tracks the batch, not the corpus. Identical result: every join in
    // jaccardFromCounts/candidateCommonCounts keys on a candidate id, and
    // the semi-join keeps ALL shingle rows of those ids, so each
    // candidate's size and intersection counts are unchanged.
    val candIds = cands.select(col("id_l").as("id"))
      .unionByName(cands.select(col("id_r").as("id")))
      .dropDuplicates("id")
    val shCand = shAll.join(candIds, Seq("id"), "left_semi")
      .localCheckpoint(false) // read three times (sizes + both probes)
    val edges = TextDedup.jaccardFromCounts(shCand,
        TextDedup.candidateCommonCounts(shCand, cands), threshold)
      .select(col("id_l").as("src"), col("id_r").as("dst"))

    // min-id components over batch ∪ touched-keeper ids
    val cc = ConnectedComponents.runOnEdges(edges)
    val keptCanon = bkKept match {
      case Some(bk) => cc.join(bk.select("id").distinct(), Seq("id"))
        .groupBy("component").agg(min("id").as("kept_canon"))
      case None => cc.limit(0).select(col("component"),
        col("id").as("kept_canon"))
    }
    val batchCc = cc.join(batch.select("id"), Seq("id"))
    val compMin = batchCc.groupBy("component").agg(min("id").as("comp_min"))
    val resolved = batchCc
      .join(compMin, Seq("component"))
      .join(keptCanon, Seq("component"), "left")
      .select(col("id"), coalesce(col("kept_canon"), col("comp_min")).as("canon"))
    val verdictB = batch.select("id")
      .join(resolved, Seq("id"), "left")
      .select(col("id"),
        when(col("canon").isNotNull && col("canon") =!= col("id"), col("canon"))
          .as("dup_of"))
      .localCheckpoint()

    // only keepers enter the stores
    val newKeep = verdictB.where(col("dup_of").isNull).select("id")
    def appendKept(store: Option[DataFrame], batchSide: DataFrame): Option[DataFrame] = {
      val kept = batchSide.join(newKeep, Seq("id"), "left_semi")
      Some(store.map(_.unionByName(kept)).getOrElse(kept).localCheckpoint())
    }
    shKept = appendKept(shKept, shB)
    bkKept = appendKept(bkKept, bkB)
    acc = Some(acc.map(_.unionByName(verdictB)).getOrElse(verdictB).localCheckpoint())
  }
}
