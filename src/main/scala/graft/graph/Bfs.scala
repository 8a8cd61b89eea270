package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Directed breadth-first search between vertex sets (the GraphFrames
  * `bfs(fromExpr, toExpr, maxPathLength)` surface; beyond-reference like
  * shortestPaths/labelPropagation).
  *
  * Output is relational — `(from_id, to_id, hops)` with the MINIMAL hop
  * count per (from, to) pair over directed edges, `hops = 0` when a from
  * vertex itself matches `toCond` — rather than GraphFrames' nested path
  * structs, which keeps it totally ordered and oracle-checkable.
  *
  * Scale shape: multi-origin frontier BFS. Each round is one equi-join of
  * the frontier against the edge list, a min-aggregate, and an anti-join
  * against the settled set — all shuffled on the vertex id; the frontier is
  * checkpointed per round and the loop stops early when it empties. State
  * is O(|origins| × |reached|): bound the origin set (as GraphFrames users
  * do — `fromExpr` is selective) or hops when the product is large. */
object Bfs {

  def run(g: PropertyGraph, fromCond: Column, toCond: Column,
      maxHops: Int, checkpointDir: Option[String] = None): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    val ckpt = Checkpointer(g.vertices.sparkSession, checkpointDir)
    val edges = g.edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))

    // settled: (origin, node, hops); BFS first touch is minimal
    var settled = ckpt(g.vertices.filter(fromCond)
      .select(col("id").as("origin"), col("id").as("node"), lit(0L).as("hops")))
    var frontier = settled
    var iter = 0
    var frontierSize = frontier.count()
    while (frontierSize > 0 && iter < maxHops) {
      // one job: the frontier count materializes the lazy checkpoint
      val nextCounted = ckpt.counted(frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("origin"), col("dst").as("node"), (col("hops") + 1).as("hops"))
        .groupBy("origin", "node").agg(min("hops").as("hops"))
        .join(settled.select("origin", "node"), Seq("origin", "node"), "left_anti"))
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
      .join(g.vertices.filter(toCond).select(col("id").as("node")), Seq("node"))
      .select(col("origin").as("from_id"), col("node").as("to_id"), col("hops"))
  }
}
