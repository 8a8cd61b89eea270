package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components on DataFrames via the alternating
  * large-star / small-star algorithm (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC'14) — the same O(log n)-round family
  * GraphFrames uses for the reference's `g.connectedComponents()`
  * (`/root/reference/01_aml_network_analysis.py:144-147`).
  *
  * Unlike GraphFrames' opaque partition-encoded longs (e.g. `68719476738`,
  * reference `:212`), the returned component id is the **minimum member id**
  * — deterministic and oracle-checkable (SURVEY.md §7.4).
  *
  * Scale design: each round is two self-shuffles on the node id
  * (groupBy-min + join), edge count never grows beyond O(m), rounds are
  * O(log n), and lineage is truncated with `localCheckpoint` per round —
  * the reference's `setCheckpointDir` pattern (`:122,145`) built into the
  * operator. Works for any orderable id type (long ids in our testdata;
  * `least/greatest/min` are type-generic).
  */
object ConnectedComponents {

  def run(g: PropertyGraph, maxIter: Int = 25,
      assumeDistinctEdges: Boolean = false,
      checkpointDir: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    val assign = runOnEdges(g.edges, maxIter, assumeDistinctEdges, checkpointDir, strict)
    g.vertices
      .join(assign, Seq("id"), "left_outer")
      .withColumn("component", coalesce(col("component"), col("id")))
  }

  /** Core loop over an edge list; returns `(id, component)` for every node
    * that appears in an edge (isolated vertices are handled by the caller's
    * left join + coalesce). Pass `assumeDistinctEdges` when the caller
    * guarantees a duplicate-free edge list — skips the up-front dedup
    * shuffle (the algorithm needs distinct edges for the convergence
    * fingerprint, not for correctness). Pass `checkpointDir` on a real
    * cluster for executor-loss-durable lineage truncation ([[Checkpointer]]).
    * Pass `strict = true` to throw instead of warn when `maxIter` rounds did
    * not converge — a split assignment is silently wrong, and callers that
    * fold it into persistent state ([[IncrementalCC]], streaming sinks) must
    * refuse it rather than corrupt every subsequent result.
    */
  def runOnEdges(edges: DataFrame, maxIter: Int = 25,
      assumeDistinctEdges: Boolean = false,
      checkpointDir: Option[String] = None,
      strict: Boolean = false): DataFrame = {
    val spark = edges.sparkSession
    val ckpt = Checkpointer(spark, checkpointDir)
    val base = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    // one job per checkpoint+fingerprint ([[Checkpointer.fingerprinted]]):
    // at bench scale the loop cost is driver-action count, not row work
    val e0 = ckpt.fingerprinted(if (assumeDistinctEdges) base else base.distinct())
    var e = e0._1
    var prevFp = e0._2
    // read once by the final join — lazy, no dedicated job
    val nodes = ckpt.lazily(
      e.select(explode(array(col("src"), col("dst"))).as("id")).distinct())

    // Adaptive broadcast gate (the SCC device): the per-round minima
    // tables are one row per live vertex — ≤ the edge-state row count the
    // convergence fingerprint already returns for free. While the state is
    // small, broadcasting the minima turns both star joins map-side (the
    // checkpointed edge state is a default-stats RDD leaf Catalyst would
    // otherwise shuffle both sides of); past the threshold the plan stays
    // the shuffle join a cluster-scale edge set needs.
    val bcRows = spark.conf
      .get("spark.graft.cc.broadcastThreshold", "2000000").toLong
    // Small-state partition collapse knob (the SCC device) — default 4:
    // re-measured round 11 with interleaved A/B arms (QTime, tide
    // cancels): collapse WINS everywhere the gate can fire — q16
    // 3.40→2.88 s, q48 6.95→5.82, q94 7.60→7.19, q20 1.88→1.66 at
    // sf0.1/local[32]; 2 and 4 are within noise of each other, 8 is
    // neutral-to-worse. (An earlier round measured collapse slower, but
    // that predated the lazy-checkpoint + one-job-per-round loop; with
    // per-round actions minimized, the remaining cost IS the per-stage
    // scheduling that collapse removes.) The gate is scale-adaptive, not
    // local-mode-tuned: collapse applies only while the round state is
    // ≤ broadcastThreshold rows (2M default) — tiny in absolute terms on
    // any cluster (≤500k two-long rows per task at 4 partitions); past
    // the threshold the plan keeps full shuffle parallelism. Set 0 to
    // disable, or raise both knobs together for bigger executors.
    val smallParts = spark.conf
      .get("spark.graft.cc.smallPartitions", "4").toInt
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val small = prevFp._1 <= bcRows
      val parts = if (small && smallParts > 0) Some(smallParts) else None
      // periodic stats reset: each star round joins the edge state against
      // aggregates of itself twice, so the sizeInBytes estimate each
      // checkpoint inherits grows ~4x per round — by round ~10 the driver
      // would multiply multi-megabit BigInts in the stats visitor (the
      // [[Checkpointer.fresh]] failure mode, measured on SCC). Resetting
      // every 4th round bounds the estimate at default*4^4 bits.
      val stepped = smallStar(largeStar(e, small, parts), small, parts)
      val (round, fp) = ckpt.fingerprinted(
        parts.map(stepped.coalesce).getOrElse(stepped))
      val next = if (iter % 4 == 3) ckpt.resetStats(round) else round
      converged = fp == prevFp
      prevFp = fp
      e = next
      iter += 1
    }
    if (!converged) {
      // partial assignments are silently wrong (one component, several ids)
      val msg = s"ConnectedComponents did not converge after $maxIter " +
        "iterations — component ids may be split"
      if (strict) throw new IllegalStateException(msg)
      // non-strict callers that can tolerate it should raise maxIter
      System.err.println(s"[graft] WARN $msg")
    }
    lastRounds.set(iter)

    // At convergence the edge set is a star per component, every edge
    // pointing (member -> minimum id). Roots map to themselves.
    val assign = e.select(col("src").as("id"), col("dst").as("component"))
    nodes.join(assign, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: connect every strictly-larger neighbor of u to
    * m = min(Γ⁺(u)). Keeps component minima flowing outward without ever
    * growing the edge set beyond O(m). */
  private def largeStar(e: DataFrame, small: Boolean,
      parts: Option[Int]): DataFrame = {
    // one explicit hash-partitioning on src serves the whole star: the
    // minima aggregate consumes it without an exchange (HashPartitioning
    // on src satisfies the groupBy's clustering), the self-join probes it
    // in place, and ReuseExchange collapses the two identical repartition
    // subtrees to one shuffle — vs the planner's default of shuffling the
    // default-stats RDD leaf separately for the aggregate AND the join
    val bidir0 = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
    val bidir = parts.map(n => bidir0.repartition(n, col("src")))
      .getOrElse(bidir0.repartition(col("src")))
    val mins0 = bidir.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("u"), least(col("mn"), col("src")).as("m"))
    val mins = if (small) broadcast(mins0) else mins0
    // no distinct here: smallStar's canonical-orientation dedup handles it,
    // saving one shuffle per round
    bidir.join(mins, bidir("src") === mins("u"))
      .where(col("dst") > col("src"))
      .select(col("dst").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
  }

  /** Small-star: orient edges large→small; connect each smaller neighbor
    * (and u itself) to the minimum smaller neighbor. */
  private def smallStar(e: DataFrame, small: Boolean,
      parts: Option[Int]): DataFrame = {
    // same partitioning-reuse shape as [[largeStar]]: partition once on u,
    // then the (u,v) dedup, the minima aggregate, and the join all run on
    // that partitioning with no further exchange
    val dir0 = e.select(
        greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
    val dir = parts.map(n => dir0.repartition(n, col("u")))
      .getOrElse(dir0.repartition(col("u")))
      .dropDuplicates("u", "v")
    val mins0 = dir.groupBy("u").agg(min("v").as("m"))
    val mins = if (small) broadcast(mins0) else mins0
    dir.join(mins, "u")
      .select(col("v").as("src"), col("m").as("dst"))
      .where(col("src") =!= col("dst"))
      .union(mins.select(col("u").as("src"), col("m").as("dst")))
      .distinct()
  }

  /** Star-contraction rounds taken by the most recent [[runOnEdges]] on the
    * calling thread — spec instrumentation for the O(log n) round-growth
    * claims (GraphScaleSpec); thread-local because Verify runs queries
    * concurrently. */
  private[graft] val lastRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))

}
