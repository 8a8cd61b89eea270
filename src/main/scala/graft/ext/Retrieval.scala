package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval: combine per-query rankings from heterogeneous
  * retrievers (lexical BM25, dense cosine, …) into one hybrid ranking —
  * the standard first stage of a modern search / RAG data pipeline, where
  * neither sparse nor dense retrieval alone has adequate recall.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009):
  * `rrf(d) = Σ_r 1/(k0 + rank_r(d))` over the rankers that returned `d`,
  * with the canonical `k0 = 60`. RRF needs no score calibration across
  * retrievers — only ranks — which is exactly why it wins in practice.
  *
  * Determinism contract: each term is one correctly-rounded double
  * division of exact integers, and the fused score is a FIXED-ORDER
  * scalar expression in the declared ranker order (not a shuffle-order
  * double aggregate), so scores are bit-stable across engines and
  * partitionings — no rounding needed.
  *
  * Scale shape: one union of the (already top-k-bounded) ranking tables,
  * one keyed aggregate per (query, doc) pivoting each ranker's rank into
  * its own column, one per-query top-k window. Input volume is
  * Σ_r k_r·|queries| — bounded by the retrievers, never by the corpus. */
object Retrieval {

  /** @param rankings (rankerName, DataFrame(query_id, doc_id, rank))
    *                 pairs; ranks are 1-based within each query.
    * @param k0 the RRF dampening constant (60 in the paper).
    * @param topK rows emitted per query after fusion. */
  def rrfFuse(rankings: Seq[(String, DataFrame)], k0: Int = 60,
      topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    // duplicate names would emit two identical rank_<nm> aggregate columns
    // — an ambiguous-column analysis failure (or a silently doubled RRF
    // term) far from this call site; fail here with the offending names
    require(rankings.map(_._1).distinct.size == rankings.size,
      s"rrfFuse: ranker names must be distinct, got " +
        rankings.map(_._1).mkString(", "))
    val tagged = rankings.map { case (nm, df) =>
      df.select(col("query_id"), col("doc_id"), lit(nm).as("__rk"),
        col("rank"))
    }.reduce(_ unionAll _)
    val rankCols = rankings.map { case (nm, _) =>
      min(when(col("__rk") === nm, col("rank"))).as(s"rank_$nm")
    }
    val fused = tagged.groupBy("query_id", "doc_id")
      .agg(rankCols.head, rankCols.tail: _*)
    val score = rankings.map { case (nm, _) =>
      coalesce(lit(1.0) / (lit(k0).cast("double") + col(s"rank_$nm")),
        lit(0.0))
    }.reduce(_ + _)
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rrf", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(Seq(col("query_id"), col("doc_id")) ++
        rankings.map { case (nm, _) => col(s"rank_$nm") } ++
        Seq(col("rrf"), col("rank")): _*)
  }
}
