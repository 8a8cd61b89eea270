package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected edge list —
  * the "who is likely connected but unobserved" primitive an AML
  * investigation layer runs on the transaction graph (the reference's
  * network notebook surfaces connected entities; link prediction ranks the
  * *missing* edges, cf. `/root/reference/01_aml_network_analysis.py:52-68`
  * which materializes observed relationships only).
  *
  * Scores (Liben-Nowell & Kleinberg 2003; Zhou, Lü & Zhang 2009):
  *  - `cn`   — common-neighbor count (exact BIGINT).
  *  - `ra_q` — Resource-Allocation index `Σ_z 1/deg(z)` quantized as
  *    `Σ_z floor(1e9 / deg(z))` in integer arithmetic, so the sum is
  *    order-independent and bit-identical on every engine and partitioning
  *    (a double `Σ 1/deg` would depend on shuffle order). RA outperforms
  *    Adamic–Adar on dense graphs and needs no logarithm.
  *
  * Scale shape: one self-join of the adjacency list on the *wedge center*
  * `z`, with hub centers (deg > `hubCap`) excluded BEFORE the join — the
  * classic wedge-explosion guard: a center of degree d emits d(d−1)/2
  * candidate pairs, so a single million-degree hub would emit 5·10¹¹ rows;
  * capped centers bound per-key fan-out at hubCap²/2 ≈ 2k rows for the
  * default 64. High-degree hubs carry negligible RA/AA signal anyway
  * (weight 1/deg → 0), so the cap is also the approximation the literature
  * recommends, not just an engineering bound. Everything downstream is a
  * keyed aggregate + one anti-join against the observed edge set.
  */
object LinkPrediction {

  /** @param edges undirected edge list (`src`, `dst`) — multi-edges and
    *              orientation are normalized away here.
    * @param hubCap drop wedge centers with degree above this.
    * @param minCommon emit only pairs with at least this many common
    *                  neighbors (the support threshold). */
  def resourceAllocation(edges: DataFrame, hubCap: Int = 64,
      minCommon: Int = 2): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    // wedges through each small-degree center z: a degree pass FIRST,
    // then collect_list only over kept (≤ hubCap) centers, then a bounded
    // double-explode of the neighbor array. Ordering matters at scale: a
    // post-aggregate degree filter would still MATERIALIZE one
    // non-spillable degree-D array row for every hub during the aggregate
    // (collect_list partials don't spill mid-row), so the bounded-array
    // invariant must hold DURING the collect, not only after it. Both
    // passes key on u, so one explicit hash-partitioning serves the
    // degree aggregate, the keep-join, and the collect with no further
    // exchange; per kept center the array is ≤ hubCap elements and the
    // double-explode emits ≤ hubCap² pair rows — the same wedge volume a
    // self-join would produce, with O(hubCap) row width.
    val adjP = adj.repartition(col("u"))
    val keep = adjP.groupBy("u").agg(count(lit(1)).as("d"))
      .where(col("d") <= hubCap)
    val cand = adjP.join(keep, "u")
      .groupBy("u", "d").agg(collect_list(col("v")).as("__ns"))
      .select(col("d"), explode(col("__ns")).as("x"), col("__ns"))
      .select(col("d"), col("x"), explode(col("__ns")).as("y"))
      .where(col("x") < col("y"))
      .select(col("x"), col("y"),
        (lit(1000000000L) / col("d")).cast("long").as("w"))
    val scored = cand.groupBy("x", "y")
      .agg(count(lit(1)).as("cn"), sum(col("w")).as("ra_q"))
      .where(col("cn") >= minCommon)
    // keep only unobserved pairs: anti-join against the edge set
    scored.join(und,
        scored("x") === und("a") && scored("y") === und("b"), "left_anti")
      .select(col("x"), col("y"), col("cn").cast("long").as("cn"),
        col("ra_q").cast("long").as("ra_q"))
  }
}
