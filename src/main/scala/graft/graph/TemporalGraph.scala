package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal (time-respecting) reachability: money can only move FORWARD in
  * time, so an AML layering chain A→B→C exists only if the B→C transfer
  * happens at-or-after the A→B one. Plain reachability over the static
  * transaction graph (q16/q59/q60) overcounts exactly these impossible
  * chains; the earliest-arrival relaxation (Wu et al. 2014, temporal graph
  * traversal) is the correct primitive — the reference's network analysis
  * (`/root/reference/01_aml_network_analysis.py:264-292`) builds the
  * static graph this refines.
  *
  * Semantics: `arrival(source) = -∞` (any outgoing edge usable);
  * `arrival(v) = min over time-respecting paths of the last edge's
  * timestamp`; an edge `(u, w, t)` is usable when `t ≥ arrival(u)`.
  * `rounds` bounds the hop count (bounded-horizon, like q139): after R
  * rounds every vertex reachable by a ≤ R-hop time-respecting path holds
  * its exact earliest arrival over those paths.
  *
  * Determinism: arrivals are exact integer timestamps relaxed by `min` —
  * a monotone semilattice fold, so the result is independent of join or
  * partition order and SQL-mirrorable round-for-round.
  *
  * Shape per round: one frontier×edges equi-join on the source vertex
  * with the time filter riding the join, one keyed `min` — the Pregel
  * shuffle profile; state is one row per (source, reached vertex). */
object TemporalGraph {

  /** Earliest-arrival table (source, v, arrival) after `rounds` hops over
    * timestamped directed edges (src, dst, t — exact integers, e.g. epoch
    * days). Sources carry arrival = Long.MinValue semantics via a
    * sentinel: their own row reports arrival 0 and every outgoing edge is
    * usable. */
  def earliestArrival(edges: DataFrame, sources: Seq[Long],
      rounds: Int): DataFrame = {
    require(sources.nonEmpty && rounds >= 1 && rounds <= 16,
      "need sources and rounds in [1, 16]")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    import spark.implicits._
    val e = ck.lazily(edges.select(col("src"), col("dst"),
      col("t").cast("long").as("t")).distinct())
    var arr = sources.toDF("source")
      .select(col("source"), col("source").as("v"),
        lit(Long.MinValue).as("arrival"))
    (1 to rounds).foreach { _ =>
      val relaxed = arr
        .join(e, arr("v") === e("src"))
        .where(col("t") >= col("arrival"))
        .select(col("source"), col("dst").as("v"), col("t").as("arrival"))
      arr = ck.lazily(arr.unionAll(relaxed)
        .groupBy("source", "v").agg(min(col("arrival")).as("arrival")))
    }
    arr
  }
}
