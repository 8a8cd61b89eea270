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

    // Broadcast gate (the SCC/Louvain device): the sketch state is exactly
    // one row per vertex forever, so one up-front count decides the WHOLE
    // run's join strategy. Gated on estimated broadcast bytes (n · 2^p
    // registers), not rows — a p=11 sketch is 2 KiB/vertex. Under the gate
    // both per-round state joins become broadcast probes and the only
    // shuffle per round is the register-max aggregate; past it everything
    // stays shuffled on the vertex key.
    val bcBytes = spark.conf
      .get("spark.graft.hyperball.broadcastBytes", "268435456").toLong
    val (state0, nVerts) = ckpt.counted(g.vertices.select(col("id"),
        call_function("hll_init", col("id"), lit(p)).as("sketch"))
      .withColumn("nf", call_function("hll_count", col("sketch")))
      .withColumn("harmonic", lit(0.0)))
    val small = nVerts * (1L << p) <= bcBytes
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var state = state0
    // fixpoint: registers stop changing → the (count, xor-hash) fingerprint
    // is bit-identical; [[Checkpointer.fingerprinted]] takes it during the
    // checkpoint-materializing scan — one job per round instead of an eager
    // checkpoint job plus a separate sum(nf) action
    var lastFp = (-1L, 0L)
    var rounds = 0
    var converged = false
    while (rounds < maxIter && !converged) {
      rounds += 1
      val merged = edges
        .join(bc(state.select(col("id").as("dst"), col("sketch"))), "dst")
        .groupBy(col("src").as("id"))
        .agg(call_function("hll_merge", col("sketch")).as("sketch"))
      val next = merged
        .join(bc(state.select(col("id"), col("nf").as("nf_prev"), col("harmonic"))), "id")
        .withColumn("nf", call_function("hll_count", col("sketch")))
        // ball growth at radius r contributes (N_r - N_{r-1}) / r; clamp
        // tiny negative estimator jitter (max-merge never shrinks a ball,
        // but the ESTIMATE can wobble within its rsd)
        .withColumn("harmonic",
          col("harmonic") + greatest(col("nf") - col("nf_prev"), lit(0.0)) / rounds)
        .select(col("id"), col("sketch"), col("nf"), col("harmonic"))
      val (st, fp) = ckpt.fingerprinted(next)
      state = st
      if (fp == lastFp) converged = true
      lastFp = fp
    }
    state.select(col("id"), col("nf").as("ball_size"), col("harmonic"),
      lit(rounds.toLong).as("rounds"))
  }
}
