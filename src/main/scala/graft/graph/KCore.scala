package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative degree pruning (Batagelj–Zaveršnik
  * peeling, distributed round form): repeatedly delete every vertex whose
  * degree in the current surviving subgraph is below `k`; the fixpoint is
  * the k-core. Complements the reference's one-shot degree-1 shrink
  * (`/root/reference/01_aml_network_analysis.py:119-127`), which is exactly
  * one round of 2-core peeling — the fixpoint generalization finds the
  * dense money-flow kernel that survives any number of cascade removals.
  *
  * Scale design: the graph is canonicalized undirected once (one
  * distinct shuffle); each round is one degree aggregation (explode +
  * hash agg with map-side combine) and two semi-joins of the edge set
  * against the surviving-vertex set — the edge set only ever shrinks, AQE
  * turns the semi-joins into broadcasts as the survivor set collapses, and
  * lineage is truncated per round via [[Checkpointer]] (reliable
  * `checkpoint()` when a dir is given, `localCheckpoint` locally).
  */
object KCore {

  /** Canonical undirected simple edges: `a < b`, self-loops dropped,
    * duplicates (either orientation) collapsed. */
  private def undirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  private def degrees(und: DataFrame): DataFrame =
    und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** One peel round: drop vertices with degree < k, keep only edges whose
    * both endpoints survive. */
  private def peel(und: DataFrame, k: Int): DataFrame = {
    val keep = degrees(und).where(col("degree") >= k).select(col("id"))
    und
      .join(keep.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(keep.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
  }

  /** Fixed-round peeling: exactly `rounds` rounds, converged or not —
    * both the Spark plan and a round-unrolled SQL oracle compute the
    * identical function of the input (the q19 fixed-superstep pattern).
    * Returns `(id, degree)` of the survivors with degrees measured in the
    * final surviving subgraph, totally ordered by the caller. */
  def pruneRounds(g: PropertyGraph, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 0, "rounds must be >= 0")
    val ckpt = Checkpointer(g.edges.sparkSession, checkpointDir)
    // lazy checkpoints: fixed-round loop, no per-round action — the final
    // degrees aggregate materializes the cascade in one job (see Pregel)
    var und = ckpt.lazily(undirected(g.edges))
    var r = 0
    while (r < rounds) {
      // periodic stats reset — see the fixpoint loop below
      und = if (r % 4 == 3) ckpt.lazyFresh(peel(und, k)) else ckpt.lazily(peel(und, k))
      r += 1
    }
    degrees(und)
  }

  /** Fixpoint k-core: peel until no vertex is removed (or `maxIter`).
    * Returns `(id, degree)` over the k-core subgraph. `strict` mirrors
    * [[ConnectedComponents]]: a truncated peel is a superset of the true
    * k-core, so state-folding callers must be able to refuse it. */
  def run(g: PropertyGraph, k: Int, maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val ckpt = Checkpointer(g.edges.sparkSession, checkpointDir)
    // one job per round: the convergence count is the action that
    // materializes each lazy checkpoint ([[Checkpointer.counted]])
    val u0 = ckpt.counted(undirected(g.edges))
    var und = u0._1
    var prev = u0._2
    var converged = prev == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      // periodic stats reset: peel joins the edge set against its own
      // degree aggregate, doubling the inherited sizeInBytes estimate per
      // round — at maxIter=50 an unbounded estimate would reach 2^50-bit
      // BigInts (the [[Checkpointer.fresh]] driver-stall failure mode)
      val (ck0, n) = ckpt.counted(peel(und, k))
      und = if (iter % 4 == 3) ckpt.resetStats(ck0) else ck0
      // the edge set shrinks monotonically, so an unchanged count IS the
      // fixpoint (no removal can follow a round that removed nothing)
      converged = n == prev
      prev = n
      iter += 1
    }
    if (!converged) {
      val msg = s"KCore(k=$k) did not converge after $maxIter rounds — " +
        "result is a superset of the true k-core"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"[graft] WARN $msg")
    }
    lastRounds.set(iter)
    degrees(und)
  }

  /** Peeling rounds taken by the most recent [[run]] on the calling thread
    * — spec instrumentation (GraphScaleSpec); thread-local because Verify
    * runs queries concurrently. */
  private[graft] val lastRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))
}
