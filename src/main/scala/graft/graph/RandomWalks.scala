package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Walk-corpus generation for graph-embedding training (the DeepWalk /
  * node2vec input stage, Perozzi 2014): one fixed-length walk from every
  * vertex. Steps are DERANDOMIZED the way the sampling operators are
  * ([[graft.ext.Sampling.arithHash]]): at step t from vertex u, the next
  * hop is the neighbor v minimizing the seeded multiplicative hash of
  * (u, v, t) — a deterministic function of the graph alone, so the corpus
  * is identical on every run, engine, and partitioning (`randomSplit`-free
  * reproducibility, and SQL-mirrorable for the oracle gate).
  *
  * Scale shape: each step is one equi-join of the frontier against the
  * adjacency list plus one per-(walk, step) window to pick the argmin —
  * walks never leave the executors, state per step is one row per walk,
  * and the adjacency list shuffles once per step on the current-vertex
  * key. Hash-walk determinism trades walk diversity for reproducibility;
  * for embedding corpora run `nWalks` arms with different seeds.
  */
object RandomWalks {

  /** Seeded per-candidate score; every intermediate stays far below Long
    * overflow for vertex ids < ~9·10¹² (the [[graft.ext.Sampling]]
    * arithmetic-hash contract). */
  private def score(u: Column, v: Column, step: Int, seed: Long): Column =
    pmod((pmod(u * lit(1000003L) + v, lit(1000000007L)) + lit(step * 7919L) +
      lit(seed)) * lit(2654435761L), lit(1000000007L))

  /** One deterministic walk of `steps` hops from every vertex, over the
    * canonical undirected adjacency. Output: `start, v1 … v<steps>`
    * (NULL-padded when a walk hits an isolated dead end — impossible on
    * an undirected graph except for isolated start vertices, which are
    * omitted). */
  def walks(edges: DataFrame, steps: Int, seed: Long): DataFrame = {
    require(steps >= 1 && steps <= 16, "steps must be in [1, 16]")
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    var frontier = adj.select(col("u").as("start")).distinct()
      .withColumn("cur", col("start"))
    (1 to steps).foreach { t =>
      // per-start argmin of (hash, v) as a map-side-combinable min(struct)
      // hash aggregate — the adjacency fanout collapses to one row per
      // walk BEFORE the exchange, vs the former sort-window (row_number
      // over a full shuffle+sort of frontier×degree rows). The carried
      // path columns are constant within a group (the frontier had
      // exactly one row per start), so they ride the struct untouched;
      // (hash, v) is unique per group (v distinct per start), so the
      // trailing fields never influence the min.
      val carry = (1 until t).map(i => s"v$i")
      val picked = frontier
        .join(adj, frontier("cur") === adj("u"))
        .withColumn("__h", score(col("cur"), col("v"), t, seed))
        .groupBy("start")
        .agg(min(struct(col("__h").as("__h") +: col("v").as(s"v$t") +:
          carry.map(col): _*)).as("__m"))
      frontier = picked.select(
        col("start") +: carry.map(c => col(s"__m.$c").as(c)) :+
          col(s"__m.v$t").as(s"v$t"): _*)
        .withColumn("cur", col(s"v$t"))
    }
    frontier.drop("cur")
  }

  /** Skip-gram training pairs from the walk corpus (word2vec input,
    * Mikolov 2013): every ordered `(center, context)` pair of walk
    * positions within `window` of each other, aggregated to exact pair
    * counts. A pure in-row position enumeration over [[walks]]' output —
    * shuffle-free until the final keyed count, output bounded by
    * walks · (steps+1) · 2·window. */
  def skipGramPairs(edges: DataFrame, steps: Int, seed: Long,
      window: Int): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val walked = walks(edges, steps, seed)
    val pos = (0 to steps).map(i => if (i == 0) col("start") else col(s"v$i"))
    val pairCols = for {
      i <- 0 to steps; j <- 0 to steps
      if i != j && math.abs(i - j) <= window
    } yield struct(pos(i).as("center"), pos(j).as("context"))
    walked
      .select(explode(array(pairCols: _*)).as("p"))
      .select(col("p.center").as("center"), col("p.context").as("context"))
      .groupBy("center", "context").agg(count(lit(1)).as("cnt"))
      .select(col("center"), col("context"), col("cnt").cast("long").as("cnt"))
  }

  /** Second-order (node2vec, Grover & Leskovec 2016) biased walks,
    * derandomized the same way as [[walks]]: at step t the next hop is
    * the neighbor minimizing `hash(cur, v, t) · f(v)`, where the integer
    * bias factor f classifies v against the PREVIOUS vertex —
    * `returnFactor` for going back (v == prev), 1 for staying in prev's
    * neighborhood (BFS-ish), `inOutFactor` for leaving it (DFS-ish).
    * Under a uniform hash a candidate's win chance scales like 1/f, so
    * the factors play the role of node2vec's p and q (bigger = less
    * likely), while every score stays an exact long — deterministic and
    * SQL-mirrorable (hash < 10⁹, factors ≤ 16 → products < 2⁶³).
    *
    * Shape: per step, [[walks]]' frontier-adjacency join plus ONE extra
    * equi-join on `(prev, v)` against the adjacency list to test
    * prev-neighborhood membership — both keyed, no broadcast of the
    * graph, per-walk state still one row. Step 1 has no prev and is
    * unbiased (identical to [[walks]]). */
  def node2vecWalks(edges: DataFrame, steps: Int, seed: Long,
      returnFactor: Int, inOutFactor: Int): DataFrame = {
    require(steps >= 1 && steps <= 16, "steps must be in [1, 16]")
    require(returnFactor >= 1 && returnFactor <= 16 &&
      inOutFactor >= 1 && inOutFactor <= 16,
      "bias factors must be in [1, 16]")
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionAll(und.select(col("b").as("u"), col("a").as("v")))
    // fresh lineage for the prev-neighborhood side: Spark's ambiguous-
    // self-join detector rejects re-joining the same adj Dataset
    val adjPrev = und.select(col("a").as("__pu"), col("b").as("__pv"))
      .unionAll(und.select(col("b").as("__pu"), col("a").as("__pv")))
    var frontier = adj.select(col("u").as("start")).distinct()
      .withColumn("prev", lit(null).cast("long"))
      .withColumn("cur", col("start"))
    (1 to steps).foreach { t =>
      val factor =
        when(col("prev").isNull, lit(1L))
          .when(col("v") === col("prev"), lit(returnFactor.toLong))
          .when(col("__pv").isNotNull, lit(1L))
          .otherwise(lit(inOutFactor.toLong))
      // same map-side-combinable argmin as [[walks]]: min(struct) keyed by
      // start replaces the sort-window; the vertex we stood on (`cur`)
      // rides the struct to become `prev`, the chosen neighbor becomes
      // both v_t and the new `cur`
      val carry = (1 until t).map(i => s"v$i")
      val picked = frontier
        .join(adj, frontier("cur") === adj("u"))
        .join(adjPrev,
          col("__pu") === col("prev") && col("__pv") === col("v"), "left")
        .withColumn("__s", score(col("cur"), col("v"), t, seed) * factor)
        .groupBy("start")
        .agg(min(struct(col("__s").as("__s") +: col("v").as(s"v$t") +:
          col("cur").as("__newprev") +: carry.map(col): _*)).as("__m"))
      frontier = picked.select(
        col("start") +: col("__m.__newprev").as("prev") +:
          carry.map(c => col(s"__m.$c").as(c)) :+
          col(s"__m.v$t").as(s"v$t"): _*)
        .withColumn("cur", col(s"v$t"))
    }
    frontier.drop("cur", "prev")
  }

  /** Positive PMI weighting of the skip-gram co-occurrence counts —
    * `ppmi(c,x) = max(0, ln(#(c,x)·N / (#(c)·#(x))))`. This is the
    * count-based embedding objective: Levy & Goldberg 2014 showed
    * word2vec's SGNS implicitly factorizes this matrix, so (walks →
    * pairs → PPMI → any distributed SVD) is a complete, deterministic
    * graph-embedding pipeline with no gradient step.
    *
    * Shape: two keyed partial-aggregates over the pair counts (center
    * marginals, context marginals), one single-row total broadcast, and
    * two equi-joins back — marginals are one row per vertex, so both join
    * sides after aggregation are ~|V|, never ~|pairs|. All arithmetic is
    * exact-integer until a single double ratio per row (longs < 2⁵³
    * convert exactly), associated identically on any engine; the rounded
    * log is the only inexact op. */
  def ppmi(pairs0: DataFrame): DataFrame = {
    // the pair table feeds four consumers (rows + two marginals + total);
    // without truncation Catalyst re-derives the whole upstream (for walk
    // corpora: the full per-step join chain) once per consumer
    val pairs = Checkpointer(pairs0.sparkSession, None).lazily(pairs0)
    val total = pairs.agg(sum("cnt").cast("long").as("n_total"))
    val cCnt = pairs.groupBy("center").agg(sum("cnt").cast("long").as("c_cnt"))
    val xCnt = pairs.groupBy("context").agg(sum("cnt").cast("long").as("x_cnt"))
    pairs
      .crossJoin(broadcast(total))
      .join(cCnt, "center")
      .join(xCnt, "context")
      .select(col("center"), col("context"), col("cnt"),
        round(greatest(lit(0.0),
          log((col("cnt").cast("double") * col("n_total")) /
            (col("c_cnt").cast("double") * col("x_cnt")))), 6).as("ppmi"))
      .where(col("ppmi") > 0)
  }
}
