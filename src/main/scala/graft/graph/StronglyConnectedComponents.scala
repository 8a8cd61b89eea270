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
    // Adaptive broadcast gate: checkpointed state is an RDD leaf with
    // default (huge) stats, so Catalyst plans every state join as a
    // shuffle join — at bench scale that reshuffles the edge set every
    // round for a state of a few thousand rows. The loop already pays
    // exact `count()` actions for convergence, so use THAT number (the
    // same exact-cardinality re-plan AQE does from materialized stages):
    // while the remaining vertex set fits comfortably in a broadcast,
    // hint state/color/membership builds broadcast — edges then never
    // re-exchange inside a round. Past the threshold (real-cluster
    // early phases) everything stays a shuffle join keyed on the vertex
    // id, which is the 100 TB-correct plan.
    val bcRows = spark.conf
      .get("spark.graft.scc.broadcastThreshold", "2000000").toLong
    def bc(df: DataFrame, small: Boolean): DataFrame =
      if (small) broadcast(df) else df
    // Small-state partition collapse: once a loop frame is provably small,
    // it still inherits the session shuffle partitioning (AQE's default
    // parallelismFirst coalescing keeps ~defaultParallelism partitions
    // however tiny the bytes), so a 13-round run schedules thousands of
    // near-empty tasks — measured ~30% of q60 at sf0.1. Coalescing the
    // checkpointed loop frames to a handful of partitions cuts the
    // per-round task count without touching the large-graph path: a false
    // gate keeps full session parallelism, which is the 100 TB-correct
    // layout. Each frame uses the gate matching its own growth bound
    // (vertsSmallOk / edgesSmallOk / nLeft-small below).
    val smallParts = spark.conf
      .get("spark.graft.scc.smallPartitions", "8").toInt
    def shrink(df: DataFrame, small: Boolean): DataFrame =
      if (small && smallParts > 0) df.coalesce(smallParts) else df
    val trimMinPeelFrac = spark.conf
      .get("spark.graft.scc.trimMinPeelFrac", "0.01").toDouble
    def dbg(msg: => String): Unit = if (sys.env.contains("GRAFT_SCC_DEBUG"))
      System.err.println(s"[scc-debug] $msg t=${System.nanoTime() / 1000000}")

    dbg("start")
    val v0 = ckpt.counted(g.vertices.select(col("id")).distinct())
    dbg(s"v0 counted n=${v0._2}")
    var verts = v0._1
    // The collapse gates are sized by what each frame can GROW to, not by
    // the current remaining-vertex count `nLeft`:
    //  - `assigned` accumulates toward the FULL vertex set (its size is the
    //    complement of nLeft), so it may only collapse when the whole
    //    vertex set is small (`vertsSmallOk`) — gating it on nLeft would
    //    coalesce ~all of a 1B-vertex graph into smallParts blocks the
    //    moment the remainder dips under the broadcast gate;
    //  - edge frames (remaining edges, in-class reversed edges) are bounded
    //    by the INITIAL distinct edge count, not by nLeft (2M remaining
    //    vertices can still carry 500M edges on a dense graph), so they
    //    collapse only under `edgesSmallOk`. The initial count is a free
    //    byproduct of the edge checkpoint every phase reads anyway, and
    //    every later edge frame is a subset of it.
    val vertsSmallOk = v0._2 <= bcRows
    val (e0, e0Count) = ckpt.counted(g.edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val edgesSmallOk = e0Count <= spark.conf
      .get("spark.graft.scc.edgeCollapseThreshold", (bcRows * 4).toString).toLong
    var edges = shrink(e0, vertsSmallOk && edgesSmallOk)
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
      // 1. trim to fixpoint: no-in or no-out vertices are singleton SCCs.
      // trimMinPeelFrac >= 1 disables trimming outright (A/B escape hatch
      // for cycle-dense graphs where even the first flags+count pass is
      // wasted work — the coloring phases absorb DAG vertices, just later).
      var trimmed = trimMinPeelFrac < 1.0
      while (trimmed && nLeft > 0) {
        val small = nLeft <= bcRows
        // one union + hash aggregate computes both endpoint flags — a single
        // shuffle, vs two distinct-projections + two semi-joins
        val flags = edges.select(col("src").as("id"), lit(1).as("o"), lit(0).as("i"))
          .union(edges.select(col("dst").as("id"), lit(0).as("o"), lit(1).as("i")))
          .groupBy("id").agg(max(col("o")).as("has_out"), max(col("i")).as("has_in"))
        // one job: the count is the action that materializes the checkpoint
        val (core, nCore) = ckpt.counted(verts.join(
          bc(flags.where(col("has_out") === 1 && col("has_in") === 1)
            .select("id"), small),
          Seq("id"), "left_semi"))
        dbg(s"trim counted nCore=$nCore nLeft=$nLeft")
        if (nCore == nLeft) trimmed = false
        else {
          val peeled = verts.join(bc(core, small), Seq("id"), "left_anti")
            .select(col("id"), col("id").as("component"))
          assigned = ckpt.lazily(shrink(assigned.union(peeled), vertsSmallOk))
          verts = core
          edges = ckpt.lazily(shrink(edges
            .join(bc(core.select(col("id").as("src")), small), Seq("src"), "left_semi")
            .join(bc(core.select(col("id").as("dst")), small), Seq("dst"), "left_semi"),
            small && edgesSmallOk))
          // trim is an optimization, not a correctness step — the FW-BW
          // coloring handles whatever remains. When a pass peeled only a
          // negligible sliver, the possible cascade is at most its
          // neighborhood; paying another full flags+count job to chase it
          // costs more than letting the coloring absorb it.
          if ((nLeft - nCore).toDouble / nLeft < trimMinPeelFrac) trimmed = false
          nLeft = nCore
        }
      }
      if (nLeft > 0) {
        val small = nLeft <= bcRows
        // 2. forward color propagation to fixpoint: color(v) = the
        // hash-order-minimum vertex id that reaches v (see minPropagate for
        // why the order is xxhash64(id), not id).
        dbg("pre-forward")
        val colors = minPropagate(verts, edges, ckpt, maxIter, strict, "forward", small)
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
        // "auto" (default): under the broadcast gate the endpoint
        // machinery's extra distinct + checkpoints cost more fixed jobs
        // than propagating over every remaining vertex saves (SccAb:
        // full 6.8 s vs endpoints 7.0 s at sf0.1), so go full; past the
        // gate the smaller endpoint state is what survives 100 TB.
        val endpointsMode =
          spark.conf.get("spark.graft.scc.collect", "auto") match {
            case "full" => false
            case "endpoints" => true
            case _ => !small
          }
        val inClassRev0 = edges
          .join(bc(colors.select(col("id").as("src"), col("color").as("__cs")), small), "src")
          .join(bc(colors.select(col("id").as("dst"), col("color").as("__cd")), small), "dst")
          .where(col("__cs") === col("__cd"))
          .select(col("dst").as("src"), col("src").as("dst"))
        val found = if (endpointsMode) {
          val inClassRev = ckpt.lazily(shrink(inClassRev0, small && edgesSmallOk))
          val endpoints = inClassRev.select(col("src").as("id"))
            .union(inClassRev.select(col("dst").as("id"))).distinct()
          val endVerts = ckpt.lazily(
            shrink(colors.join(bc(endpoints, small), Seq("id"), "left_semi"), small))
          val bcolors = minPropagate(endVerts, inClassRev, ckpt, maxIter, strict, "backward", small)
          // roots (singleton-class or not) are members of their own SCC by
          // reflexivity; non-root endpoints are members iff they reach the
          // root (bcolor == color); non-root non-endpoints never are.
          colors.where(col("id") === col("color"))
            .union(endVerts
              .join(bc(bcolors.withColumnRenamed("color", "bcolor"), small), Seq("id"))
              .where(col("color") === col("bcolor") && col("id") =!= col("color"))
              .select(col("id"), col("color")))
        } else {
          val bcolors = minPropagate(verts,
            ckpt.lazily(shrink(inClassRev0, small && edgesSmallOk)),
            ckpt, maxIter, strict, "backward", small)
          colors.join(bc(bcolors.withColumnRenamed("color", "bcolor"), small), Seq("id"))
            .where(col("color") === col("bcolor"))
            .select(col("id"), col("color"))
        }
        // roots are hash-order minima, not id minima — remap each found SCC
        // to its minimum member id so the public component id stays the
        // deterministic oracle-checkable min-member contract
        val minIds = found.groupBy("color").agg(min("id").as("component"))
        val members = ckpt.lazily(shrink(found.join(bc(minIds, small), "color")
          .select(col("id"), col("component")), small))
        // 4. assign and peel the found SCCs
        assigned = ckpt.lazily(shrink(assigned.union(members), vertsSmallOk))
        dbg("pre-assign")
        val vertsCounted = ckpt.counted(shrink(
          verts.join(bc(members, small), Seq("id"), "left_anti"), small))
        verts = vertsCounted._1
        nLeft = vertsCounted._2
        edges = ckpt.lazily(shrink(edges
          .join(bc(verts.select(col("id").as("src")), small), Seq("src"), "left_semi")
          .join(bc(verts.select(col("id").as("dst")), small), Seq("dst"), "left_semi"),
          small && edgesSmallOk))
      }
      dbg(s"phase $phase done nLeft=$nLeft")
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
    * (column `color`). Convergence is a changed-row count taken by
    * accumulator DURING the checkpoint-materializing scan
    * ([[Checkpointer.changeCounted]]): the round's aggregate carries the
    * previous color alongside the new one (the seed rows are tagged, and
    * `min` over only-seed rows recovers it — state is distinct per id),
    * so `changed == 0` detects the fixpoint with no fingerprint
    * aggregate, no extra exchange, and no checksum-collision caveat.
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
      phaseName: String, small: Boolean): DataFrame = {
    // per-round state is ≤ the phase's remaining vertex set, whose exact
    // count gated `small` in the caller — broadcast it into the edge-push
    // and pointer-jump joins so the (much larger) edge set never
    // re-exchanges inside the loop; the only shuffle left per round is
    // the min-aggregate on the pushed rows
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // same small-state partition collapse as the caller: the round's agg
    // output is ≤ nLeft rows — coalesce before the materializing scan so
    // the checkpoint pins (and every next-round read schedules) a handful
    // of blocks, not session-parallelism many
    val smallParts = verts.sparkSession.conf
      .get("spark.graft.scc.smallPartitions", "8").toInt
    def shrink(df: DataFrame): DataFrame =
      if (small && smallParts > 0) df.coalesce(smallParts) else df
    val jumpHops = verts.sparkSession.conf
      .get("spark.graft.scc.jumpHops", "2").toInt.max(1)
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
    // one job per round: the accumulator probe materializes the lazy
    // checkpoint ([[Checkpointer.changeCounted]]); stats reset afterwards
    // on the already-materialized frame
    def ckChanged(df: DataFrame, reset: Boolean): (DataFrame, Long) = {
      val (ck0, changed) = ckpt.changeCounted(df, "chg")
      (if (fresh && reset) ckpt.resetStats(ck0) else ck0, changed)
    }
    // the seed is a plain projection of the already-checkpointed verts —
    // no checkpoint or probe job of its own; the loop always runs at
    // least one round (the seed is only a fixpoint when the edge set is
    // empty, and that degenerate round is cheap)
    // Micro-round chaining: compose `probeEvery` propagation rounds into
    // ONE lazy plan and pay the checkpoint-materializing probe job only on
    // the last of them. At bench scale a round is almost pure fixed
    // overhead (broadcast-build job + probe job on ~15k rows), so probing
    // every 2nd round removes ~a job per round at the cost of at most
    // probeEvery−1 extra (cheap) rounds past the fixpoint and a plan that
    // is probeEvery rounds deep between checkpoints.
    val probeEvery = verts.sparkSession.conf
      .get("spark.graft.scc.probeEvery", "1").toInt.max(1)
    var st = verts.select(col("id"), col("id").as("w"))
    var stable = false
    var it = 0
    // One propagation micro-round over `cur`: edge-push + pointer jumps,
    // min-aggregate. Returns (id, w, chg) where chg flags ids whose color
    // moved THIS micro-round — the seed rows ride tagged through the union
    // so the aggregate recovers the previous color per id (min over
    // only-seed rows — the seed is exactly one row per id) next to the new
    // min, with no extra exchange.
    def oneRound(cur: DataFrame, jump: Boolean): DataFrame = {
      // both the edge-push and the pointer jump build against the SAME
      // un-projected `cur` plan so the BroadcastExchanges canonicalize
      // identically and ReuseExchange collapses them to one broadcast
      // build per micro-round (projections live on the probe side / after
      // the join instead)
      val stBc = bc(cur)
      val pushed = edges
        .join(stBc, edges("src") === stBc("id"))
        .select(col("dst").as("id"), col("w"), lit(false).as("__seed"))
      val base = cur.withColumn("__seed", lit(true)).union(pushed)
      // jump from round 2 (round 1's jump is the identity on seeds): with
      // the broadcast gate each hop is a build-free probe of the SAME
      // reused broadcast (ReuseExchange), so h hops cost ~one codegen
      // stage and reach grows (h+1)× per round instead of 2× — the round
      // count (the dominant fixed cost at bench scale) drops to
      // log_{h+1}(diameter). Diminishing past a few hops (measured: 4+
      // hops loses — each hop widens the union the aggregate consumes).
      val folded = if (!jump) base else {
        val stL = cur.select(col("id").as("__vid"), col("w").as("__w"))
        var hop = stL.join(stBc, stL("__w") === stBc("id"))
          .select(col("__vid"), col("w").as("__w1"))
        var acc = base.union(hop.select(col("__vid").as("id"),
          col("__w1").as("w"), lit(false).as("__seed")))
        var h = 1
        while (h < jumpHops) {
          hop = hop.join(stBc, hop("__w1") === stBc("id"))
            .select(col("__vid"), col("w").as("__w1"))
          acc = acc.union(hop.select(col("__vid").as("id"),
            col("__w1").as("w"), lit(false).as("__seed")))
          h += 1
        }
        acc
      }
      folded.groupBy("id")
        .agg(min(ord(col("w"))).getField("w").as("w"),
          min(when(col("__seed"), ord(col("w")))).getField("w").as("__w_old"))
        .withColumn("chg", col("__w_old").isNull || col("w") =!= col("__w_old"))
        .select("id", "w", "chg")
    }
    while (!stable && it < maxIter) {
      // chain up to probeEvery micro-rounds lazily; only the last one's
      // materializing scan carries the accumulator probe. `chg` of the
      // final micro-round vs its predecessor detects the fixpoint exactly
      // (0 changes in a full round ⇒ converged), at most probeEvery−1
      // rounds late.
      var cur = st
      var sub = 0
      while (sub < probeEvery && it + sub < maxIter) {
        cur = oneRound(cur.select("id", "w"), jump = it + sub >= 1)
        sub += 1
      }
      val (next3, changed) = ckChanged(shrink(cur), reset = (it / 4) != ((it + sub) / 4))
      stable = changed == 0L
      st = next3.select("id", "w")
      it += sub
      if (sys.env.contains("GRAFT_SCC_DEBUG"))
        System.err.println(s"[scc-debug] $phaseName it=$it changed=$changed t=${System.nanoTime() / 1000000}")
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
