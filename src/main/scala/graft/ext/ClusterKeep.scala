package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared cluster-contraction back end for the dedup operators: near-dup
  * edges → min-id connected components → exactly one best-quality keeper
  * per component. Used by [[Similarity.semanticDedupClusters]] (embedding
  * path, q88) and [[TextDedup.dedupClusters]] (text path, q94).
  *
  * Scale shape: O(log n) CC rounds over the (already linear-in-corpus)
  * edge set, one argmax aggregate + one join for the keep rule. The keep
  * rule is argmax-by-(quality, −id) via `max_by`, a map-side-combinable
  * aggregate, so even a million-member component never sorts in one task
  * the way a row_number window would.
  */
private[graft] object ClusterKeep {

  /** `quality` is (id, quality); `edges` is (src, dst), assumed distinct.
    * Returns (id, quality, cluster_id, is_dropped) for every quality row —
    * cluster_id = min member id (own id for singletons), keeper = highest
    * quality, ties keep the lowest id. */
  def assignAndKeep(quality: DataFrame, edges: DataFrame,
      checkpointDir: Option[String]): DataFrame = {
    val assign = graft.graph.ConnectedComponents
      .runOnEdges(edges, assumeDistinctEdges = true, checkpointDir = checkpointDir)
    val withComp = quality
      .join(assign, Seq("id"), "left_outer")
      .select(col("id"), col("quality"),
        coalesce(col("component"), col("id")).as("cluster_id"))
    val keep = withComp.groupBy("cluster_id")
      .agg(max_by(col("id"), struct(col("quality"), negate(col("id")))).as("__keep"))
    withComp.join(keep, "cluster_id")
      .select(col("id"), col("quality"), col("cluster_id"),
        (col("id") =!= col("__keep")).as("is_dropped"))
  }
}
