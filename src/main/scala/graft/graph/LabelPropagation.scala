package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (the GraphFrames `labelPropagation`
  * community-detection surface; GraphFrames API — the reference stops at
  * CC/motifs/pregel, so this is a beyond-reference graph operator like
  * triangleCount/pageRank).
  *
  * Labels start as vertex ids; each round every vertex adopts the most
  * frequent label among its (undirected) neighbors. GraphFrames leaves the
  * tie order unspecified — here ties break to the SMALLEST label, which
  * makes runs deterministic and oracle-checkable. Vertices with no
  * neighbors keep their own id. Fixed `maxIter` rounds, as in
  * GraphFrames/GraphX (synchronous LPA may oscillate, so there is no
  * convergence fixpoint to detect).
  *
  * Scale shape per round: one equi-join of the bidirectional edge list
  * against the current labels (shuffle on the vertex id) and two hash
  * aggregations — label counts per (vertex, label), then a `min_by`
  * argmax per vertex; map-side partial aggregation applies to both. State
  * is one (id, label) row per vertex; lineage is truncated per round. */
object LabelPropagation {

  def run(g: PropertyGraph, maxIter: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter >= 1, "labelPropagation needs at least one round")
    val ckpt = Checkpointer(g.vertices.sparkSession, checkpointDir)
    // lazy checkpoints: fixed-round loop, no per-round action — see Pregel
    val bidir = ckpt.lazily(g.edges.select(col("src"), col("dst"))
      .union(g.edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")))
    val ids = g.vertices.select(col("id"))
    var labels = ckpt.lazily(ids.select(col("id"), col("id").as("label")))
    for (_ <- 1 to maxIter) {
      val msgs = bidir
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val counts = msgs.groupBy("id", "label").agg(count(lit(1)).as("cnt"))
      // argmax count with smallest-label tie-break: min_by over the
      // lexicographic (-cnt, label) struct
      val winners = counts.groupBy("id")
        .agg(expr("min_by(label, struct(-cnt, label))").as("label"))
      labels = ckpt.lazyFresh(ids
        .join(winners, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("label"), col("id")).as("label")))
    }
    labels
  }
}
