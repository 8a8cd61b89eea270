package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimum spanning forest via distributed Borůvka (1926) — the MST
  * primitive of bulk-parallel graph stacks: every component picks its
  * minimum incident cross-component edge, picked edges merge components,
  * components at least halve per round ⇒ O(log n) rounds. The total
  * order on edges is the lexical `(w, a, b)` triple, so the forest is
  * UNIQUE even with duplicate weights — every run, engine, and
  * partitioning selects the same edges (the tie-break-by-id determinism
  * device used across this package).
  *
  * Shape per round: one comp-label join per endpoint, one `min(struct)`
  * keyed argmin per component (map-side combinable), one contraction =
  * [[ConnectedComponents]] over the PICKED edges only (≤ one pick per
  * component — component-count-sized input, not edge-count-sized), one
  * label-rewrite join. No cartesian products; state is `(vertex, comp)`
  * plus the accumulated forest, lazily checkpointed per round like the
  * other iterative operators.
  *
  * 100 TB shape: parallel edges are reduced up front to their per-pair
  * minimum (a non-minimal parallel edge can never be picked), every join
  * is keyed on vertex/component ids, and the per-round merge graph
  * shrinks geometrically.
  */
object MinSpanningForest {

  /** Borůvka over an undirected weighted edge list. `wCol` must be an
    * exact integer weight (quantize upstream — the usual cents trick).
    * `rounds = 0` runs to convergence (no cross-component edge left);
    * a positive `rounds` replays exactly that many rounds (the
    * round-unrolled-oracle convention of q135–q139). Returns the forest
    * edges `(a, b, w)` with `a < b`. */
  def boruvka(edges: DataFrame, wCol: String, rounds: Int = 0): DataFrame = {
    require(rounds >= 0 && rounds <= 32, "rounds must be in [0, 32]")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val ew = ck.lazily(edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"),
        col(wCol).cast("long").as("w"))
      .where(col("a") =!= col("b"))
      .groupBy("a", "b").agg(min("w").as("w")))
    // comp is vertex-sized and only ever RELABELED (contraction never adds
    // rows), so one exact count up front gates broadcasting it — and the
    // per-round mapping, which is component-count-sized, strictly smaller
    // — into the label joins (the SCC/CC adaptive-broadcast device)
    val bcRows = spark.conf
      .get("spark.graft.msf.broadcastThreshold", "2000000").toLong
    val (comp0, nV) = ck.counted(ew.select(col("a").as("id"))
      .unionAll(ew.select(col("b").as("id")))
      .distinct().withColumn("comp", col("id")))
    val small = nV <= bcRows
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    var comp = comp0
    var forest: DataFrame = ew.limit(0)
    var iter = 0
    var done = false
    while (!done && (if (rounds == 0) iter < 64 else iter < rounds)) {
      iter += 1
      val labeled = ew
        .join(bc(comp.select(col("id").as("a"), col("comp").as("__ca"))), Seq("a"))
        .join(bc(comp.select(col("id").as("b"), col("comp").as("__cb"))), Seq("b"))
        .where(col("__ca") =!= col("__cb"))
      // each live edge bids at both endpoint components; min (w, a, b)
      // per component wins, the opposite component rides for the merge
      val cand = labeled.select(col("__ca").as("c"),
          struct(col("w"), col("a"), col("b")).as("e"), col("__cb").as("o"))
        .unionAll(labeled.select(col("__cb").as("c"),
          struct(col("w"), col("a"), col("b")).as("e"), col("__ca").as("o")))
      val pickRaw = cand.groupBy("c")
        // the argmin key is e alone — o is a function of (c, e), so it
        // rides the winning struct without ever acting as a comparator
        .agg(min(struct(col("e"), col("o"))).as("m"))
        .select(col("c"), col("m.e.w").as("w"), col("m.e.a").as("a"),
          col("m.e.b").as("b"), col("m.o").as("o"))
      val (picked, nPicked) =
        ck.counted(pickRaw.select("a", "b", "w").distinct())
      if (nPicked == 0) done = true
      else {
        forest = ck.lazily(forest.unionAll(picked))
        // contraction: the pick table is a FUNCTIONAL graph (one out-edge
        // per component), and under the total (w, a, b) edge order its
        // only cycles are 2-cycles — along any longer pick cycle the
        // picked-edge keys would have to strictly decrease all the way
        // around (each component's pick is ≤ its incident predecessor's
        // pick-edge), which is impossible. So a full CC run is overkill:
        // break each 2-cycle at its smaller endpoint (that component
        // becomes the tree root) and pointer-jump parents to the root —
        // one tiny keyed join per round, O(log tree-depth) rounds, vs
        // CC's two star phases (union + repartition + agg + join each)
        // per round on the same table.
        val par0 = pickRaw.select(col("c"), col("o"))
        var par = ck.lazily(par0.as("x")
          .join(bc(par0.select(col("c").as("__oc"), col("o").as("__oo"))),
            col("x.o") === col("__oc"))
          .select(col("x.c").as("c"),
            when(col("__oo") === col("x.c") && col("x.c") < col("x.o"),
              col("x.c")).otherwise(col("x.o")).as("p")))
        var stable = false
        var jumps = 0
        while (!stable && jumps < 40) {
          val nxt = par.as("x")
            .join(bc(par.select(col("c").as("__pc"), col("p").as("__pp"))),
              col("x.p") === col("__pc"))
            .select(col("x.c").as("c"), col("__pp").as("p"),
              (col("x.p") =!= col("__pp")).as("chg"))
          // the jump self-joins par, so the inherited sizeInBytes estimate
          // squares per round — reset leaf stats every round (the table is
          // component-count-sized; the conversion cost is noise)
          val (ckd, changed) = ck.changeCounted(nxt, "chg")
          par = ck.resetStats(ckd).select("c", "p")
          stable = changed == 0L
          jumps += 1
        }
        val mapping = par.select(col("c").as("comp"), col("p").as("component"))
        comp = ck.lazily(comp
          .join(bc(mapping), Seq("comp"), "left_outer")
          .select(col("id"), coalesce(col("component"), col("comp")).as("comp")))
      }
    }
    forest
  }
}
