package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition (Cohen 2008): the maximal subgraph in which every
  * edge participates in at least k−2 triangles *within the subgraph* —
  * the edge-support analogue of [[KCore]]'s vertex-degree peeling, and a
  * much stronger cohesion filter (every k-truss is inside the (k−1)-core,
  * never vice versa). For the AML graph this is the "everyone transacts
  * with everyone's counterparties" kernel that survives cascade removal —
  * the tightest money-ring candidate set.
  *
  * Algorithm: iterate { count per-edge triangle support via the ordered
  * wedge join; drop edges with support < k−2 } to the fixpoint. Each round
  * is the [[PropertyGraph.triangleCount]] join shape re-keyed to EDGES
  * (every a<b<c triangle contributes support to its three edges) plus one
  * anti-shrink semi-filter — all keyed equi-joins, edge set monotonically
  * shrinking, lineage truncated per round via [[Checkpointer.counted]]
  * (the convergence count doubles as the materializing action, one job
  * per round). Same convergence contract as KCore: monotone shrink means
  * an unchanged edge count IS the fixpoint; `strict` refuses a truncated
  * (superset) result.
  */
object KTruss {

  private def undirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  /** Per-edge triangle support over the current subgraph: enumerate
    * ordered triangles x<y<z, emit each of the three member edges, count.
    * Edges in no triangle get support 0 via the left join. */
  private def support(und: DataFrame): DataFrame = {
    val tri = und.as("e1")
      .join(und.as("e2"), col("e1.b") === col("e2.a"))
      .join(und.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val memberEdges = tri.select(col("x").as("a"), col("y").as("b"))
      .unionAll(tri.select(col("y").as("a"), col("z").as("b")))
      .unionAll(tri.select(col("x").as("a"), col("z").as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("supp"))
    und.join(memberEdges, Seq("a", "b"), "left_outer")
      .withColumn("supp", coalesce(col("supp"), lit(0L)))
  }

  /** Fixed-round peeling — exactly `rounds` support-filter rounds,
    * converged or not: the same function of the input as a round-unrolled
    * SQL oracle (the q69/KCore.pruneRounds pattern). Returns
    * `(a, b, supp)` with support re-measured in the final subgraph. */
  def peelRounds(g: PropertyGraph, k: Int, rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 2, "k must be >= 2")
    require(rounds >= 0, "rounds must be >= 0")
    val ckpt = Checkpointer(g.edges.sparkSession, checkpointDir)
    var und = ckpt.lazily(undirected(g.edges))
    var r = 0
    while (r < rounds) {
      val peeled = support(und).where(col("supp") >= k - 2)
        .select(col("a"), col("b"))
      und = if (r % 2 == 1) ckpt.lazyFresh(peeled) else ckpt.lazily(peeled)
      r += 1
    }
    support(und).select(col("a"), col("b"), col("supp").cast("long").as("supp"))
  }

  /** Fixpoint k-truss edge set: `(a, b, supp)` with support measured in
    * the final surviving subgraph, a < b. */
  def run(g: PropertyGraph, k: Int, maxIter: Int = 50,
      checkpointDir: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    require(k >= 2, "k must be >= 2 (the 2-truss is the whole simple graph)")
    val ckpt = Checkpointer(g.edges.sparkSession, checkpointDir)
    val u0 = ckpt.counted(undirected(g.edges))
    var und = u0._1
    var prev = u0._2
    var converged = prev == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val peeled = support(und).where(col("supp") >= k - 2)
        .select(col("a"), col("b"))
      val (ck0, n) = ckpt.counted(peeled)
      // periodic stats reset — the support join inflates inherited
      // estimates the same way KCore's degree join does
      und = if (iter % 4 == 3) ckpt.resetStats(ck0) else ck0
      converged = n == prev
      prev = n
      iter += 1
    }
    if (!converged) {
      val msg = s"KTruss(k=$k) did not converge after $maxIter rounds — " +
        "result is a superset of the true k-truss"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"[graft] WARN $msg")
    }
    lastRounds.set(iter)
    support(und).select(col("a"), col("b"), col("supp").cast("long").as("supp"))
  }

  /** Rounds taken by the most recent [[run]] on the calling thread. */
  private[graft] val lastRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))
}
