package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark shortest paths (BFS hop distance), completing the GraphFrames
  * surface the reference builds on (`g.shortestPaths(landmarks=...)`;
  * GraphFrames API — the reference itself stops at CC/motifs/pregel, so
  * this is a beyond-reference graph operator like triangleCount/pageRank).
  *
  * Output is relational — one `(id, landmark, dist)` row per vertex that
  * can reach a landmark — rather than GraphFrames' per-vertex map column,
  * which keeps it totally ordered and oracle-checkable.
  *
  * Scale shape: classic distributed frontier BFS. Each round is one
  * equi-join of the current frontier against the (bidirectional) edge list,
  * an anti-join against the settled set, and a min-aggregate — all
  * shuffled on the vertex id; the frontier is checkpointed per round so
  * lineage stays flat. Rounds = graph diameter. State is
  * O(|V| × |landmarks|), the same bound GraphFrames carries.
  */
object ShortestPaths {

  /** Hop distances from every vertex to each landmark over undirected
    * edges. Vertices with no path to a landmark have no row for it. */
  def run(g: PropertyGraph, landmarks: Seq[Long], maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = g.edges.sparkSession
    val ckpt = Checkpointer(spark, checkpointDir)
    import spark.implicits._

    val bidir = ckpt(g.edges.select(col("src"), col("dst"))
      .union(g.edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst")).distinct())

    // settled: (id, landmark, dist) with dist final (BFS: first touch is
    // minimal). Seed: each landmark at distance 0 from itself.
    var settled = ckpt(landmarks.toDF("landmark")
      .select(col("landmark").as("id"), col("landmark"),
        lit(0L).as("dist")))
    var frontier = settled
    var iter = 0
    var frontierSize = landmarks.size.toLong
    while (frontierSize > 0 && iter < maxIter) {
      // one job: the frontier count materializes the lazy checkpoint
      val nextCounted = ckpt.counted(frontier
        .join(bidir, frontier("id") === bidir("src"))
        .select(col("dst").as("id"), col("landmark"),
          (col("dist") + 1).as("dist"))
        .groupBy("id", "landmark").agg(min("dist").as("dist"))
        .join(settled.select("id", "landmark"), Seq("id", "landmark"), "left_anti"))
      val next = nextCounted._1
      frontierSize = nextCounted._2
      // periodic stats reset — settled unions a frame derived from itself
      // each round, doubling the inherited sizeInBytes estimate (see
      // [[Checkpointer.fresh]] for the BigInt-stall failure mode)
      settled =
        if (iter % 4 == 3) ckpt.lazyFresh(settled.union(next))
        else ckpt.lazily(settled.union(next))
      frontier = next
      iter += 1
    }
    settled
  }
}
