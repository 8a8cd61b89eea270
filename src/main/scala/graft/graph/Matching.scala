package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed maximal matching, derandomized Israeli–Itai style: each
  * round, an edge joins the matching iff it is the MINIMUM-priority
  * incident edge of BOTH its endpoints among still-unmatched edges, where
  * priority is the seeded arithmetic hash of the edge (a deterministic
  * function of the graph — the same derandomization as
  * [[RandomWalks.walks]]). Both-endpoint-local-minimum edges can never
  * conflict, so every round adds an independent edge set; matched
  * endpoints drop out and the residual graph shrinks. A constant fraction
  * of edges leaves per round in expectation under a uniform hash —
  * O(log E) rounds to maximality, the classic parallel-matching bound.
  *
  * Matchings are the coarsening primitive (multilevel graph partitioning,
  * graph sparsification) and the assignment step of dedup-merge planning:
  * disjoint merge pairs that can execute in parallel.
  *
  * Scale shape per round: one per-endpoint min aggregate (explode each
  * edge to its two endpoints, `min(struct)` per vertex — map-side
  * combinable), one join of edges against the two endpoint minima, and an
  * anti-join to drop matched endpoints. All keyed equi-joins; no windows,
  * no driver state beyond the round counter; per-round lineage bounded by
  * a lazy checkpoint. Fixed `rounds` keeps results SQL-mirrorable; run
  * more rounds for maximality (spec-verified) — each extra round on a
  * shrunken residual is cheaper than the last.
  */
object Matching {

  private def prio(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column, seed: Long) =
    pmod((pmod(a * lit(1000003L) + b, lit(1000000007L)) + lit(seed)) *
      lit(2654435761L), lit(1000000007L))

  /** Returns the matched edges (a, b) with a < b after `rounds` rounds. */
  def maximalMatching(edges: DataFrame, rounds: Int,
      seed: Long = 17L): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    val ck = Checkpointer(edges.sparkSession, None)
    var live = ck.lazily(edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .withColumn("h", prio(col("a"), col("b"), seed)))
    var matched: DataFrame = live.limit(0).select(col("a"), col("b"))
    (1 to rounds).foreach { _ =>
      // per-endpoint minimum incident edge, total order (h, a, b)
      val ends = live.select(col("a").as("v"), struct("h", "a", "b").as("e"))
        .unionAll(live.select(col("b").as("v"), struct("h", "a", "b").as("e")))
      val vmin = ends.groupBy("v").agg(min("e").as("me"))
      val won = live
        .join(vmin.select(col("v").as("a"), col("me").as("__ma")), "a")
        .join(vmin.select(col("v").as("b"), col("me").as("__mb")), "b")
        .where(col("__ma") === struct(col("h"), col("a"), col("b")) &&
          col("__mb") === struct(col("h"), col("a"), col("b")))
        .select(col("a"), col("b"))
      matched = matched.unionAll(won)
      val hit = ck.lazily(won.select(col("a").as("v"))
        .unionAll(won.select(col("b").as("v"))))
      live = ck.lazily(live
        .join(hit.withColumnRenamed("v", "a"), Seq("a"), "left_anti")
        .join(hit.withColumnRenamed("v", "b"), Seq("b"), "left_anti")
        .select(col("a"), col("b"), col("h")))
    }
    ck.lazily(matched)
  }

  /** Maximal independent set, Luby-derandomized (the vertex analogue of
    * [[maximalMatching]]): a vertex joins the MIS iff its seeded hash
    * priority `(p, v)` is strictly below every LIVE neighbor's — local
    * minima are never adjacent, so each round adds an independent set;
    * the selected vertices and their neighborhoods leave the graph and a
    * constant fraction of edges dies per round in expectation
    * (Luby 1986). Vertices whose live neighborhood emptied (all
    * neighbors removed as neighbors-of-selected) select unconditionally
    * next round, which is what drives maximality.
    *
    * Shape per round: one priority projection, one adjacency×priority
    * join + `min(struct)` per vertex, one anti-join removal, two
    * semi-joins restricting the adjacency — all keyed; state is the live
    * vertex set. Priorities stay exact longs for ids < ~9·10¹² (the
    * [[RandomWalks]] arithmetic-hash contract). */
  def maximalIndependentSet(edges: DataFrame, rounds: Int,
      seed: Long = 17L): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    val ck = Checkpointer(edges.sparkSession, None)
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    var adj = ck.lazily(
      und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v"))))
    var live = adj.select(col("u").as("v")).distinct()
    var selected = live.limit(0)
    val prioOf = (c: org.apache.spark.sql.Column) =>
      pmod(pmod(c * lit(1000003L) + lit(seed), lit(1000000007L)) *
        lit(2654435761L), lit(1000000007L))
    (1 to rounds).foreach { _ =>
      val withP = live.withColumn("p", prioOf(col("v")))
      val nbrMin = adj
        .join(withP.select(col("v").as("__nv"), col("p").as("__np")),
          col("v") === col("__nv"))
        .groupBy("u").agg(min(struct(col("__np"), col("v"))).as("mn"))
      val sel = ck.lazily(withP
        .join(nbrMin.withColumnRenamed("u", "v"), Seq("v"), "left")
        .where(col("mn").isNull ||
          struct(col("p"), col("v")) < col("mn"))
        .select("v"))
      selected = selected.unionAll(sel)
      val dead = sel.unionAll(
        adj.join(sel.withColumnRenamed("v", "u"), Seq("u"), "left_semi")
          .select(col("v"))).distinct()
      live = ck.lazily(live.join(dead, Seq("v"), "left_anti"))
      adj = ck.lazily(adj
        .join(live.withColumnRenamed("v", "u"), Seq("u"), "left_semi")
        .join(live, Seq("v"), "left_semi"))
    }
    ck.lazily(selected)
  }
}
