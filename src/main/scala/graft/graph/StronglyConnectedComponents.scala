package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strongly connected components (the GraphFrames
  * `stronglyConnectedComponents` surface; beyond-reference like
  * shortestPaths/labelPropagation) via the standard distributed
  * trim + forward-backward coloring algorithm (GraphX's formulation,
  * after Fleischer/Hendrickson/Pinar's divide-and-conquer and
  * Slota et al.'s trimming):
  *
  *  1. *Trim* to fixpoint: a vertex with no in-edges or no out-edges in the
  *     remaining subgraph is its own SCC — peel and repeat (resolves all
  *     DAG-like regions without any propagation phase).
  *  2. *Color*: forward-propagate the order-minimum reaching vertex to
  *     fixpoint (the order is (xxhash64(id), id) — see minPropagate for
  *     why) — each round folds one edge-push join AND one pointer jump
  *     (color-of-color) into the min-aggregate, so rounds scale with
  *     O(log diameter) rather than diameter.
  *  3. *Collect*: a color class's root is the vertex that IS its color (the
  *     class order-minimum); the SCC of that root = vertices of the class
  *     that reach the root. "v reaches the root" is itself a
  *     min-propagation: run the SAME pointer-jumped loop over the
  *     class-internal edges *reversed* (SCC paths never leave the color
  *     class), giving each vertex the order-minimum in-class vertex it
  *     reaches; v is in the SCC iff that backward minimum equals its
  *     color. Both directions are thus O(log diameter) rounds — a long
  *     cycle no longer degenerates the collect phase to O(n) one-hop
  *     frontier rounds.
  *  4. Assign, remove, repeat on the remainder.
  *
  * Component id = minimum member id (deterministic, oracle-checkable,
  * unlike GraphFrames' partition-encoded longs). Every step is an
  * equi-join/aggregate plan shuffled on the vertex id, lineage truncated
  * per round; phases ≤ SCC count on pathological chains (bounded by
  * `maxPhases`, non-convergence surfaced like [[ConnectedComponents]]).
  */
object StronglyConnectedComponents {

  def run(g: PropertyGraph, maxIter: Int = 25, maxPhases: Int = 20,
      checkpointDir: Option[String] = None, strict: Boolean = false): DataFrame = {
    val spark = g.vertices.sparkSession
    val ckpt = Checkpointer(spark, checkpointDir)

    val v0 = ckpt.counted(g.vertices.select(col("id")).distinct())
    var verts = v0._1
    var edges = ckpt.lazily(g.edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    var assigned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          g.vertices.schema("id").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("component",
          g.vertices.schema("id").dataType, nullable = true))))

    lastRounds.set(0)
    var phase = 0
    var nLeft = v0._2
    while (nLeft > 0 && phase < maxPhases) {
      // 1. trim to fixpoint: no-in or no-out vertices are singleton SCCs
      var trimmed = true
      while (trimmed && nLeft > 0) {
        // one union + hash aggregate computes both endpoint flags — a single
        // shuffle, vs two distinct-projections + two semi-joins
        val flags = edges.select(col("src").as("id"), lit(1).as("o"), lit(0).as("i"))
          .union(edges.select(col("dst").as("id"), lit(0).as("o"), lit(1).as("i")))
          .groupBy("id").agg(max(col("o")).as("has_out"), max(col("i")).as("has_in"))
        // one job: the count is the action that materializes the checkpoint
        val (core, nCore) = ckpt.counted(verts.join(
          flags.where(col("has_out") === 1 && col("has_in") === 1).select("id"),
          Seq("id"), "left_semi"))
        if (nCore == nLeft) trimmed = false
        else {
          val peeled = verts.join(core, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("component"))
          assigned = ckpt.lazily(assigned.union(peeled))
          verts = core
          edges = ckpt.lazily(edges
            .join(core.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(core.select(col("id").as("dst")), Seq("dst"), "left_semi"))
          nLeft = nCore
        }
      }
      if (nLeft > 0) {
        // 2. forward color propagation to fixpoint: color(v) = the
        // hash-order-minimum vertex id that reaches v (see minPropagate for
        // why the order is xxhash64(id), not id).
        val colors = minPropagate(verts, edges, ckpt, maxIter, strict, "forward")
        // 3. collect: SCC paths never leave a color class (a cross-class
        // shortcut would merge the classes — the argument in minPropagate's
        // scaladoc holds for any total order), so restrict to class-internal
        // edges, reverse them, and propagate again: bcolor(v) = hash-order
        // minimum in-class vertex v reaches. The class root is the class
        // order-minimum, so v is in the root's SCC iff bcolor(v) ==
        // color(v). Same pointer-jumped loop, same O(log diameter) rounds.
        //
        // Two collect strategies, selected by spark.graft.scc.collect:
        //
        //  - "endpoints" (default): only an *endpoint of a class-internal
        //    edge* can end up with bcolor(v) != v — every other vertex
        //    keeps its seed and is in the root's SCC iff it IS a root
        //    (color(v) == v; every nonempty class has exactly one, its
        //    order-minimum — any vertex with color(c)=c' would drag the
        //    whole class to c'). The backward pass runs over the
        //    in-class-edge endpoint set only: strictly smaller state than
        //    both round-3's all-remaining-vertices pass and round-4's
        //    multi-member-class pass, at the price of one distinct + two
        //    extra per-phase checkpoints.
        //  - "full": propagate over all remaining vertices with no
        //    class-size machinery at all — fewer fixed per-phase jobs,
        //    right when in-class endpoints are most of the graph anyway.
        val endpointsMode =
          spark.conf.get("spark.graft.scc.collect", "endpoints") != "full"
        val inClassRev0 = edges
          .join(colors.select(col("id").as("src"), col("color").as("__cs")), "src")
          .join(colors.select(col("id").as("dst"), col("color").as("__cd")), "dst")
          .where(col("__cs") === col("__cd"))
          .select(col("dst").as("src"), col("src").as("dst"))
        val found = if (endpointsMode) {
          val inClassRev = ckpt.lazily(inClassRev0)
          val endpoints = inClassRev.select(col("src").as("id"))
            .union(inClassRev.select(col("dst").as("id"))).distinct()
          val endVerts = ckpt.lazily(colors.join(endpoints, Seq("id"), "left_semi"))
          val bcolors = minPropagate(endVerts, inClassRev, ckpt, maxIter, strict, "backward")
          // roots (singleton-class or not) are members of their own SCC by
          // reflexivity; non-root endpoints are members iff they reach the
          // root (bcolor == color); non-root non-endpoints never are.
          colors.where(col("id") === col("color"))
            .union(endVerts
              .join(bcolors.withColumnRenamed("color", "bcolor"), Seq("id"))
              .where(col("color") === col("bcolor") && col("id") =!= col("color"))
              .select(col("id"), col("color")))
        } else {
          val bcolors = minPropagate(verts, inClassRev0, ckpt, maxIter, strict, "backward")
          colors.join(bcolors.withColumnRenamed("color", "bcolor"), Seq("id"))
            .where(col("color") === col("bcolor"))
            .select(col("id"), col("color"))
        }
        // roots are hash-order minima, not id minima — remap each found SCC
        // to its minimum member id so the public component id stays the
        // deterministic oracle-checkable min-member contract
        val minIds = found.groupBy("color").agg(min("id").as("component"))
        val members = ckpt.lazily(found.join(minIds, "color")
          .select(col("id"), col("component")))
        // 4. assign and peel the found SCCs
        assigned = ckpt.lazily(assigned.union(members))
        val vertsCounted = ckpt.counted(verts.join(members, Seq("id"), "left_anti"))
        verts = vertsCounted._1
        nLeft = vertsCounted._2
        edges = ckpt.lazily(edges
          .join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi"))
      }
      phase += 1
    }
    if (nLeft > 0) {
      val msg = s"SCC did not finish within $maxPhases phases — " +
        s"$nLeft vertices unassigned (pathological SCC chain?)"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"[graft] WARN $msg")
      // remaining vertices fall back to singletons so output stays total
      assigned = assigned.union(verts.select(col("id"), col("id").as("component")))
    }
    assigned
  }

  /** Order-min reacher propagation over `edges` (src → dst) to fixpoint,
    * starting from color(v) = v: returns, per vertex, the minimum vertex
    * *under the order (xxhash64(id), id)* with a directed path to it
    * (column `color`). Convergence is the (count, XOR-checksum) fingerprint
    * idiom of [[ConnectedComponents]] — one aggregate scan of the
    * checkpointed state instead of a change-detection join per round (state
    * is distinct per id, so fingerprint equality <=> nothing moved, modulo
    * 64-bit collision).
    *
    * Each round folds the edge-push join with a pointer jump
    * (color-of-color): color(v) = w means "w reaches v", so anything known
    * to reach w also reaches v transitively — known minima travel
    * doubling-length paths, collapsing the round count from O(diameter) to
    * O(log diameter). The order is the HASH of the id, not the id itself:
    * a single min-witness jump stalls when the witness is a self-pointer,
    * which under the raw-id order happens on every cycle whose ids run
    * monotone along the propagation direction (a perfectly ordinary layout
    * — round 3 paid for it with a second max-witness jump join and a wider
    * 3-column state). Under a hash order a monotone-in-order cycle would
    * require ids whose xxhash64 happens to be monotone along the cycle —
    * measure-zero for real data, and any residual pathology is still
    * bounded by `maxIter` + the strict-mode surfacing below. Net: one
    * witness join instead of two, 2-column state instead of 3, same
    * O(log diameter) rounds on both cycle orientations (SccJumpSpec).
    * The jump join costs ~a round, so it is enabled only once the cheap
    * edge-push rounds have NOT converged (it >= 3) — small-diameter graphs
    * finish before paying for it, long chains still get the log behavior.
    *
    * Correctness is order-agnostic (any total order yields a valid FW-BW
    * coloring; callers remap SCCs to min member id), so the hash appears
    * only in the aggregate's ordering key, never in the output. */
  private def minPropagate(verts: DataFrame, edges: DataFrame,
      ckpt: Checkpointer, maxIter: Int, strict: Boolean,
      phaseName: String): DataFrame = {
    // order key: (xxhash64(w), w) — the id tiebreak makes the order total
    // even across hash collisions, keeping min() deterministic
    def ord(w: Column): Column = struct(xxhash64(w).as("h"), w.as("w"))
    // The pointer jump below self-joins the state, so the sizeInBytes
    // estimate each checkpoint inherits from its origin plan SQUARES every
    // round — bit-length doubles per generation, and past ~15 rounds the
    // driver stalls for minutes multiplying million-bit BigInts inside the
    // stats visitor (see [[Checkpointer.fresh]]). Resetting the leaf stats
    // EVERY round would pay fresh's InternalRow↔Row conversion on each of
    // the ~3 state reads per round (measured ~8% of q60 at sf0.1);
    // resetting every 4th round bounds the estimate at default·2⁴ bits —
    // still trivial to multiply — at a quarter of the conversion cost.
    // spark.graft.scc.freshStats=false disables the reset entirely (A/B
    // escape hatch; unsafe past ~15 propagation rounds).
    val fresh = verts.sparkSession.conf
      .get("spark.graft.scc.freshStats", "true") != "false"
    // one job per round: the fingerprint aggregate materializes the lazy
    // checkpoint ([[Checkpointer.fingerprinted]]); stats reset afterwards
    // on the already-materialized frame
    def ckFp(df: DataFrame, reset: Boolean): (DataFrame, (Long, Long)) = {
      val (ck0, fp) = ckpt.fingerprinted(df)
      (if (fresh && reset) ckpt.resetStats(ck0) else ck0, fp)
    }
    // the seed is a plain projection of the already-checkpointed verts —
    // no checkpoint or fingerprint job of its own. prevFp starts null, so
    // the loop always runs at least one round; that trades the former
    // seed-fingerprint job for one (cheap) extra round ONLY in the
    // degenerate already-converged case (empty class-internal edge set).
    var st = verts.select(col("id"), col("id").as("w"))
    var prevFp: (Long, Long) = null
    var stable = false
    var it = 0
    while (!stable && it < maxIter) {
      val pushed = edges
        .join(st.select(col("id").as("src"), col("w")), "src")
        .select(col("dst").as("id"), col("w"))
      val base = st.union(pushed)
      val folded = if (it < 3) base else {
        val jumped = st.select(col("id"), col("w").as("__w"))
          .join(st.select(col("id").as("__w"), col("w").as("__w2")), "__w")
          .select(col("id"), col("__w2").as("w"))
        base.union(jumped)
      }
      val (next, fp) = ckFp(folded.groupBy("id")
        .agg(min(ord(col("w"))).getField("w").as("w")), reset = it % 4 == 3)
      stable = fp == prevFp
      prevFp = fp
      st = next
      it += 1
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        System.err.println(s"[scc-debug] $phaseName it=$it fp=$fp stable=$stable t=${System.nanoTime() / 1000000}")
    }
    if (!stable) {
      val msg = s"SCC $phaseName propagation did not converge after " +
        s"$maxIter rounds — raise maxIter"
      if (strict) throw new IllegalStateException(msg)
      System.err.println(s"[graft] WARN $msg")
    }
    lastRounds.set(lastRounds.get + it)
    st.select(col("id"), col("w").as("color"))
  }

  /** Total propagation rounds (forward + backward, all phases) of the most
    * recent [[run]] on the calling thread — spec instrumentation
    * (GraphScaleSpec); thread-local because Verify runs queries
    * concurrently. */
  private[graft] val lastRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))

}
