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

  /** Layering-chain detection: simple k-hop paths where every hop moves
    * STRICTLY forward in time within `windowT` of the previous hop and
    * passes on at least `decayPermille`/1000 of the amount it received
    * (and no more than all of it) — the launder-with-fees signature
    * (placement → layering chains; FATF typology). Gates ride the join;
    * exact integer timestamps and amounts (cents) keep every comparison
    * engine-identical.
    *
    * Shape: k−1 frontier×edges equi-joins on the chain head, each with
    * the time/amount/simple-path gates inline — candidate growth is cut
    * at the join, never materialized then filtered. The simple-path gate
    * carries the visited-id array in-row (k ≤ 6 — bounded state, no
    * quadratic blowup). Output: one row per chain with endpoints, hop
    * timestamps span, and amount retention.
    *
    * 100 TB: per-hop fan-out is bounded by the time window (a vertex's
    * outgoing edges within `windowT` of one arrival), the dominant join
    * is keyed on the frontier head, and chain state is O(k) per row. */
  def layeringChains(edges: DataFrame, hops: Int, windowT: Long,
      decayPermille: Int = 800): DataFrame = {
    require(hops >= 2 && hops <= 6, "hops must be in [2, 6]")
    require(decayPermille >= 0 && decayPermille <= 1000,
      "decayPermille must be in [0, 1000]")
    val ck = Checkpointer(edges.sparkSession, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"),
        col("t").cast("long").as("t"), col("amt").cast("long").as("amt"))
      .where(col("src") =!= col("dst")).distinct())
    var chains = e.select(
      col("src").as("v0"), col("dst").as("head"),
      col("t").as("t0"), col("t").as("t_last"),
      col("amt").as("amt0"), col("amt").as("amt_last"),
      array(col("src"), col("dst")).as("__path"))
    (2 to hops).foreach { _ =>
      chains = ck.lazily(chains
        .join(e, chains("head") === e("src"))
        .where(col("t") > col("t_last") &&
          col("t") <= col("t_last") + lit(windowT) &&
          col("amt") <= col("amt_last") &&
          col("amt") * 1000L >= col("amt_last") * lit(decayPermille.toLong) &&
          !array_contains(col("__path"), col("dst")))
        .select(col("v0"), col("dst").as("head"), col("t0"),
          col("t").as("t_last"), col("amt0"), col("amt").as("amt_last"),
          array_append(col("__path"), col("dst")).as("__path")))
    }
    chains.select(col("v0"), col("head").as("vk"), col("t0"),
      col("t_last").as("tk"), col("amt0"), col("amt_last").as("amtk"))
  }
}
