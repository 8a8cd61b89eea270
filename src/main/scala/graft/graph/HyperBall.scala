package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperBall (Boldi & Vigna 2013, "In-Core Computation of Geometric
  * Centralities with HyperBall"): ALL-vertex neighborhood functions and
  * harmonic centrality in O(rounds · E) by carrying a HyperLogLog sketch
  * of each vertex's ball — `B_{r+1}(v) = B_r(v) ∪ ⋃_{v→u} B_r(u)` becomes
  * an element-wise register max ([[graft.functions.HllMergeAgg]]), one
  * keyed aggregate per round. Complements [[Centrality.harmonic]] (exact
  * distances from K landmarks): HyperBall covers EVERY vertex at fixed
  * per-vertex state (2^p bytes), the trade a 100 TB graph forces.
  *
  * Spark shape per round: edges ⋈ sketches (shuffle on dst), one
  * register-max aggregate keyed by src — the corpus of sketches never
  * expands beyond |V| rows; rounds are bounded by the graph diameter and
  * detected by a fixpoint (register max is idempotent, so convergence is
  * EXACT, not a tolerance). Register max is also associative/commutative,
  * so every estimate is exactly partitioning-independent — asserted in
  * HyperBallSpec. Hash-dependent (xxhash64 registers), hence spec-gated
  * rather than oracle-gated, like PPR.
  *
  * AML reading: harmonic centrality over the transaction graph ranks the
  * few-hops-from-everyone intermediaries (reference
  * `01_aml_network_analysis.py`'s risk-propagation theme at :410-480).
  */
object HyperBall {

  /** Per-vertex out-ball size and harmonic centrality estimates.
    * Output: (id, ball_size, harmonic, rounds).
    *
    * @param p sketch precision: 2^p byte registers per vertex
    *          (p=6 → 64 B state, ~13% rsd; p=11 → 2 KiB, ~2.3%) */
  def run(g: PropertyGraph, p: Int = 6, maxIter: Int = 32,
      checkpointDir: Option[String] = None): DataFrame = {
    val spark = g.edges.sparkSession
    val ckpt = Checkpointer(spark, checkpointDir)

    // self-loops keep every vertex's own ball in the single aggregate and
    // carry isolated vertices through every round
    val edges = ckpt(g.edges.select(col("src"), col("dst"))
      .union(g.vertices.select(col("id").as("src"), col("id").as("dst")))
      .distinct())

    var state = ckpt(g.vertices.select(col("id"),
        call_function("hll_init", col("id"), lit(p)).as("sketch"))
      .withColumn("nf", call_function("hll_count", col("sketch")))
      .withColumn("harmonic", lit(0.0)))
    var lastTotal = Double.NaN
    var rounds = 0
    var converged = false
    while (rounds < maxIter && !converged) {
      rounds += 1
      val merged = edges
        .join(state.select(col("id").as("dst"), col("sketch")), "dst")
        .groupBy(col("src").as("id"))
        .agg(call_function("hll_merge", col("sketch")).as("sketch"))
      val next = merged
        .join(state.select(col("id"), col("nf").as("nf_prev"), col("harmonic")), "id")
        .withColumn("nf", call_function("hll_count", col("sketch")))
        // ball growth at radius r contributes (N_r - N_{r-1}) / r; clamp
        // tiny negative estimator jitter (max-merge never shrinks a ball,
        // but the ESTIMATE can wobble within its rsd)
        .withColumn("harmonic",
          col("harmonic") + greatest(col("nf") - col("nf_prev"), lit(0.0)) / rounds)
        .select(col("id"), col("sketch"), col("nf"), col("harmonic"))
      state = ckpt(next)
      // fixpoint: registers stop changing → the nf sum is bit-identical
      val total = state.agg(sum("nf")).head().getDouble(0)
      if (total == lastTotal) converged = true
      lastTotal = total
    }
    state.select(col("id"), col("nf").as("ball_size"), col("harmonic"),
      lit(rounds.toLong).as("rounds"))
  }
}
