package graft.graph

import org.apache.spark.sql.DataFrame
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
  *  2. *Color*: forward-propagate the minimum reaching vertex id to
  *     fixpoint — each round folds one edge-push join AND one pointer
  *     jump (color-of-color) into the min-aggregate, so rounds scale with
  *     O(log diameter) rather than diameter.
  *  3. *Collect*: a color class's root is the vertex that IS its color; the
  *     SCC of that root = vertices of the class that reach the root —
  *     backward frontier expansion restricted to the class.
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

    var verts = ckpt(g.vertices.select(col("id")).distinct())
    var edges = ckpt(g.edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    var assigned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          g.vertices.schema("id").dataType, nullable = true),
        org.apache.spark.sql.types.StructField("component",
          g.vertices.schema("id").dataType, nullable = true))))

    var phase = 0
    var nLeft = verts.count()
    while (nLeft > 0 && phase < maxPhases) {
      // 1. trim to fixpoint: no-in or no-out vertices are singleton SCCs
      var trimmed = true
      while (trimmed && nLeft > 0) {
        // one union + hash aggregate computes both endpoint flags — a single
        // shuffle, vs two distinct-projections + two semi-joins
        val flags = edges.select(col("src").as("id"), lit(1).as("o"), lit(0).as("i"))
          .union(edges.select(col("dst").as("id"), lit(0).as("o"), lit(1).as("i")))
          .groupBy("id").agg(max(col("o")).as("has_out"), max(col("i")).as("has_in"))
        val core = ckpt(verts.join(
          flags.where(col("has_out") === 1 && col("has_in") === 1).select("id"),
          Seq("id"), "left_semi"))
        val nCore = core.count()
        if (nCore == nLeft) trimmed = false
        else {
          val peeled = verts.join(core, Seq("id"), "left_anti")
            .select(col("id"), col("id").as("component"))
          assigned = ckpt(assigned.union(peeled))
          verts = core
          edges = ckpt(edges
            .join(core.select(col("id").as("src")), Seq("src"), "left_semi")
            .join(core.select(col("id").as("dst")), Seq("dst"), "left_semi"))
          nLeft = nCore
        }
      }
      if (nLeft > 0) {
        // 2. forward min-color propagation to fixpoint. Convergence is the
        // (count, XOR-checksum) fingerprint idiom of [[ConnectedComponents]]
        // — one aggregate scan of the checkpointed colors instead of a
        // change-detection join per round (colors are distinct per id, so
        // fingerprint equality <=> no color moved, modulo 64-bit collision).
        var colors = ckpt(verts.select(col("id"), col("id").as("color")))
        var stable = false
        var it = 0
        var prevFp = fingerprint(colors)
        while (!stable && it < maxIter) {
          val pushed = edges
            .join(colors.select(col("id").as("src"), col("color")), "src")
            .select(col("dst").as("id"), col("color"))
          // pointer jump: color(v) = m means "m reaches v", so color(m)
          // also reaches v transitively — folding it in makes the minimum
          // travel doubling-length paths, collapsing the round count from
          // O(diameter) to O(log diameter) (pointer-jumping shortcutting
          // applied to min-reachability). The jump join costs ~a third of
          // a round, so it is enabled only once the cheap edge-push rounds
          // have NOT converged (it >= 3) — small-diameter graphs finish
          // before paying for it, long chains still get the log behavior.
          val base = colors.union(pushed)
          val folded = if (it < 3) base else {
            val jumped = colors.as("c")
              .join(colors.select(col("id").as("color"), col("color").as("c2")), "color")
              .select(col("id"), col("c2").as("color"))
            base.union(jumped)
          }
          val next = ckpt(folded.groupBy("id").agg(min("color").as("color")))
          val fp = fingerprint(next)
          stable = fp == prevFp
          prevFp = fp
          colors = next
          it += 1
        }
        if (!stable) {
          val msg = s"SCC color propagation did not converge after $maxIter " +
            "rounds — raise maxIter"
          if (strict) throw new IllegalStateException(msg)
          System.err.println(s"[graft] WARN $msg")
        }
        // 3. backward reach from each class root, restricted to the class
        var members = ckpt(colors.where(col("id") === col("color"))
          .select(col("id"), col("color").as("component")))
        var frontier = members
        var fSize = frontier.count()
        while (fSize > 0) {
          val next = ckpt(edges
            .join(frontier.select(col("id").as("dst"), col("component")), "dst")
            .select(col("src").as("id"), col("component"))
            .distinct()
            .join(colors, Seq("id"))
            .where(col("color") === col("component")) // stay inside the class
            .select(col("id"), col("component"))
            .join(members, Seq("id"), "left_anti"))
          fSize = next.count()
          members = ckpt(members.union(next))
          frontier = next
        }
        // 4. assign and peel the found SCCs
        assigned = ckpt(assigned.union(members))
        verts = ckpt(verts.join(members, Seq("id"), "left_anti"))
        edges = ckpt(edges
          .join(verts.select(col("id").as("src")), Seq("src"), "left_semi")
          .join(verts.select(col("id").as("dst")), Seq("dst"), "left_semi"))
        nLeft = verts.count()
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

  /** (row count, XOR-combined xxhash64) of an (id, color) assignment — the
    * same one-aggregate convergence checksum [[ConnectedComponents]] uses
    * (safe because the set is distinct per id: no XOR cancellation). */
  private def fingerprint(colors: DataFrame): (Long, Long) = {
    val row = colors.select(xxhash64(col("id"), col("color")).as("h"))
      .agg(count(lit(1)).as("c"), coalesce(expr("bit_xor(h)"), lit(0L)).as("x"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
