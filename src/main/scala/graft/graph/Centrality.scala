package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Landmark-sampled centrality — the Eppstein–Wang (2004) estimator family:
  * run BFS from K pivot vertices ([[ShortestPaths]], O(K · E) total work)
  * and aggregate per-vertex distance statistics; estimates converge at
  * O(1/√K) independent of graph size, which is why pivot sampling is THE
  * scalable centrality recipe (exact all-pairs is O(V·E) — impossible at
  * 100 TB).
  *
  * AML reading (reference `01_aml_network_analysis.py`'s risk-propagation
  * theme): high harmonic centrality = an entity a short hop from
  * everything — the hub/intermediary shape risk teams triage first.
  *
  * Determinism: distances are exact integers; `1/d` terms are summed as
  * exact integers via the lcm(1..20) = 232792560 scaling (every d ≤ 20
  * divides it, so `L div d` is exact and the sum is associative), with ONE
  * double division at the end — bit-identical in any engine and any
  * partitioning. */
object Centrality {

  private val L = 232792560L // lcm(1..20): exact 1/d terms for dist <= 20

  /** Per-vertex harmonic (Σ 1/d) and closeness (reached / Σ d) over the
    * landmark sample. The landmark itself (dist 0) is excluded. Output:
    * (id, n_reached, harmonic, closeness). */
  def harmonic(g: PropertyGraph, landmarks: Seq[Long], maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxIter <= 20, s"maxIter $maxIter > 20 breaks the lcm scaling")
    ShortestPaths.run(g, landmarks, maxIter, checkpointDir)
      .filter(col("dist") > 0)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_reached"),
        sum(expr(s"$L div dist")).as("__h"),
        sum(col("dist")).as("__sumd"))
      .select(col("id"), col("n_reached"),
        (col("__h").cast("double") / L).as("harmonic"),
        (col("n_reached").cast("double") / col("__sumd")).as("closeness"))
  }
}
