package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental connected components: maintain a `(id, component)` assignment
  * across arriving edge batches — the streaming-native form of the
  * reference's batch `g.connectedComponents()` rebuild
  * (`/root/reference/01_aml_network_analysis.py:144-147`), for its "as new
  * transactions are discovered" aspiration (`:486`).
  *
  * Each [[step]] contracts the new batch through the current assignment and
  * runs [[ConnectedComponents]] only on the **contracted representative
  * graph** — edges between component ids — which after the first batches is
  * far smaller than the cumulative edge set. Components are min-member-id
  * normalized, and since each representative is already the minimum of its
  * members, the contracted minimum equals the global minimum — so folding
  * batches through [[step]] is **exactly** equal to one batch CC over the
  * union of all edges (IncrementalCCSpec proves it; registered query
  * q48 shares q16's recursive-CTE oracle).
  *
  * Scale shape per batch: one join of the batch edges against the assignment
  * (shuffle on id), an O(log c) CC over contracted edges (c = components
  * touched, not total nodes), and one join to remap the assignment. State is
  * a single columnar table — checkpoint it via `checkpointDir` on a real
  * cluster, or persist it with `foreachBatch` in Structured Streaming
  * ([[graft.streaming.Streams.incrementalCCSink]]).
  */
object IncrementalCC {

  /** An empty assignment with the right schema, derived from an edge frame. */
  def emptyAssignment(edges: DataFrame): DataFrame =
    edges.sparkSession.createDataFrame(
      edges.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          edges.schema("src").dataType, nullable = false),
        org.apache.spark.sql.types.StructField("component",
          edges.schema("src").dataType, nullable = false))))

  /** Merge one batch of edges `(src, dst)` into assignment `(id, component)`.
    * Returns the updated assignment covering all previously-seen nodes plus
    * the batch's nodes. Deterministic: component = min member id. */
  def step(assign: DataFrame, batchEdges: DataFrame,
      checkpointDir: Option[String] = None): DataFrame =
    stepTagged(assign, batchEdges, checkpointDir).drop("__changed")

  /** [[step]] plus the CHANGED-ROW set: `(next assignment, rows whose
    * component is new or differs from `assign`)`. The changed set is a
    * filter on the fold's own remap join — new nodes are tagged on entry,
    * remapped rows are exactly those the compMap join matched with a
    * different component — so it costs one boolean column, NOT a second
    * O(V) anti-join of next against previous (measured: that anti-join
    * added ~50% per batch at 10M vertices, graft.SinkScale). Both returned
    * frames share one checkpointed plan. The O(batch)-sized changed set is
    * what a delta-committing sink persists per micro-batch
    * ([[graft.streaming.Streams.IncrementalCCSink]] `snapshotEvery`). */
  def stepWithChanges(assign: DataFrame, batchEdges: DataFrame,
      checkpointDir: Option[String] = None): (DataFrame, DataFrame) = {
    val t = stepTagged(assign, batchEdges, checkpointDir)
    (t.drop("__changed"), t.where(col("__changed")).drop("__changed"))
  }

  private def stepTagged(assign: DataFrame, batchEdges: DataFrame,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = Checkpointer(batchEdges.sparkSession, checkpointDir)
    val e = batchEdges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))

    // 1. Map both endpoints through the current assignment (unseen node →
    //    itself). Two left joins on the assignment, shuffled on id once each.
    val aSrc = assign.select(col("id").as("src"), col("component").as("csrc"))
    val aDst = assign.select(col("id").as("dst"), col("component").as("cdst"))
    val contracted = e
      .join(aSrc, Seq("src"), "left_outer")
      .join(aDst, Seq("dst"), "left_outer")
      .select(
        coalesce(col("csrc"), col("src")).as("src"),
        coalesce(col("cdst"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))

    // 2. CC over the contracted representative graph only. Representatives
    //    are minima of their members, so min(representatives) = min(members).
    //    strict: a non-converged (split) assignment folded into persistent
    //    state would corrupt every subsequent batch — refuse it instead.
    val compMap = ConnectedComponents
      .runOnEdges(contracted, checkpointDir = checkpointDir, strict = true)
      .select(col("id").as("component"), col("component").as("newc"))

    // 3. New nodes enter with themselves as component; then one join remaps
    //    every row whose representative was merged.
    val newNodes = e.select(explode(array(col("src"), col("dst"))).as("id"))
      .distinct()
      .join(assign.select("id"), Seq("id"), "left_anti")
      .select(col("id"), col("id").as("component"))

    // resetStats: the updated assignment's plan references the previous
    // assignment three times (both remap sides + the CC input), so the
    // inherited sizeInBytes estimate ~triples per batch — harmless over
    // q48's three batches, but a streaming sink folds hundreds of batches
    // and would hit the BigInt-stats stall ([[Checkpointer.fresh]])
    ckpt.lazyFresh(assign.withColumn("__new", lit(false))
      .union(newNodes.withColumn("__new", lit(true)))
      .join(compMap, Seq("component"), "left_outer")
      .select(col("id"),
        coalesce(col("newc"), col("component")).as("component"),
        (col("__new") ||
          coalesce(col("newc") =!= col("component"), lit(false))).as("__changed")))
  }

  /** Fold a sequence of edge batches from an empty assignment — the batch
    * harness for the streaming sink and the q48 registered query. The
    * first batch runs plain CC directly: folding it through the empty
    * assignment is semantically identical (contraction through nothing is
    * the identity) but would pay two shuffle joins against an empty table
    * the optimizer cannot see is empty (it is RDD-backed, not a
    * LocalRelation). */
  def runBatches(batches: Seq[DataFrame],
      checkpointDir: Option[String] = None): DataFrame = {
    require(batches.nonEmpty, "need at least one edge batch")
    val first = ConnectedComponents.runOnEdges(batches.head,
      checkpointDir = checkpointDir, strict = true)
    batches.tail.foldLeft(first) { (a, b) => step(a, b, checkpointDir) }
  }
}
