package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Louvain community detection (Blondel et al. 2008), the FULL multi-level
  * loop: a move phase where each vertex repeatedly moves to the neighboring
  * community with the best modularity gain ([[phase1]]/[[phase1Weighted]]),
  * then community contraction to a weighted super-graph ([[contract]]) and
  * repeat ([[run]]). The reference analyzes transaction-graph communities implicitly
  * through connected components and motifs
  * (`/root/reference/01_aml_network_analysis.py:264-292`); Louvain is the
  * modularity-refining upgrade — splitting a giant component into dense
  * transaction clusters.
  *
  * This is the SYNCHRONOUS, DERANDOMIZED variant: every vertex evaluates
  * its move against the PREVIOUS round's labels simultaneously (no
  * sequential sweep — the distributed-Louvain formulation), and the
  * winning community is the exact-integer argmax of
  *
  *   gain(i→C) ∝ 2m·k_{i,C} − Σ_C·k_i
  *
  * (k_{i,C} = edges from i into C, Σ_C = degree mass of C with i's own
  * degree removed when C is i's current community, m = undirected edge
  * count. This is the standard ΔQ numerator with the constant 1/(2m)²
  * dropped — sign- and order-preserving). All quantities are exact: longs
  * while m < 2³⁰ (the score is bounded by 4m², so it fits 2⁶³), exact
  * decimal(38,0) past that gate (contracted super-vertices carry
  * community-sized kic/k that scale with m itself, so no degree bound
  * saves the long form at scale; decimal is exact to m < ~1.5·10¹⁸).
  * Ties break toward the smallest community id, so rounds are
  * bit-deterministic on any engine/partitioning and SQL-mirrorable.
  *
  * Synchronous simultaneous moves oscillate on symmetric structures (two
  * mutually-attracted vertices swap labels forever — the known 2-cycle
  * pathology of parallel local moving). The schedule therefore ALTERNATES
  * move direction: odd rounds admit only target communities with id ≤
  * own, even rounds only id ≥ own. A swap needs both directions in one
  * round, so 2-cycles are impossible, while mass still flows both ways
  * across consecutive rounds — the deterministic analogue of the coloring
  * schedules in distributed Louvain implementations (Vite/Grappolo).
  *
  * Scale shape per round: one adjacency×labels equi-join + keyed count
  * (k_{i,C}), one labels×degree aggregate (Σ_C), one `max(struct)`
  * argmax per vertex (map-side combinable — no per-vertex window), and a
  * broadcast single-row m. State between rounds is one (vertex, label)
  * row per vertex, lineage-bounded by a lazy checkpoint per round.
  * Candidate set per vertex is its distinct neighbor communities — the
  * degree-bounded Louvain frontier, never all communities.
  */
object Louvain {

  /** Undirected weighted-dedup of a raw edge list: `(a, b, w=1)` with
    * `a < b`, self-edges dropped — level-1 input for [[phase1Weighted]]. */
  private def undirected(edges: DataFrame): DataFrame = edges.select(
      least(col("src"), col("dst")).as("a"),
      greatest(col("src"), col("dst")).as("b"))
    .where(col("a") =!= col("b")).distinct()
    .withColumn("w", lit(1L))

  /** `rounds` synchronous move rounds from singleton communities.
    * Returns (v, community). */
  def phase1(edges: DataFrame, rounds: Int): DataFrame =
    phase1Weighted(undirected(edges), rounds)

  /** The weighted core of the move phase, over an undirected weighted
    * graph `wund(a, b, w)` with `a <= b` (rows with `a = b` are
    * self-loops, as produced by [[contract]]). Weighted Louvain per
    * Blondel §2: `k_i = Σ_j w_ij + 2·self_i`, `m = Σ w` (self rows once),
    * `k_{i,C} = Σ_{j∈C, j≠i} w_ij`; the gain argmax and the alternating
    * direction schedule are exactly the unweighted form's — at `w = 1`
    * with no self rows this IS the unweighted phase (q135's oracle
    * unrolls it verbatim). Weights stay exact longs throughout. */
  def phase1Weighted(wund: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 32, "rounds must be in [1, 32]")
    val spark = wund.sparkSession
    val ck = Checkpointer(spark, None)
    // Broadcast gate + small-state partition collapse (the SCC pattern —
    // see StronglyConnectedComponents.run): checkpointed loop state is an
    // RDD leaf with default (huge) stats, so every labels/deg join would
    // otherwise plan as a shuffle join, re-exchanging the (much larger)
    // adjacency every round. The vertex count is paid once below; while
    // it fits, every vertex-sized build side is broadcast-hinted and
    // vertex-sized checkpoints coalesce to a handful of partitions. Past
    // the gate everything stays shuffled on the vertex key — the
    // 100 TB-correct plan.
    val bcRows = spark.conf
      .get("spark.graft.louvain.broadcastThreshold", "2000000").toLong
    val smallParts = spark.conf
      .get("spark.graft.louvain.smallPartitions", "8").toInt
    val inter = wund.where(col("a") =!= col("b"))
    val self = wund.where(col("a") === col("b"))
      .select(col("a").as("u"), col("w"))
    val adj = ck.lazily(
      inter.select(col("a").as("u"), col("b").as("v"), col("w"))
        .unionAll(inter.select(col("b").as("u"), col("a").as("v"), col("w"))))
    val (labels0, n) = ck.counted(adj.select(col("u").as("v"))
      .unionAll(self.select(col("u").as("v")))
      .distinct()
      .withColumn("c", col("v")))
    val small = n <= bcRows
    def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    def shrink(df: DataFrame): DataFrame =
      if (small && smallParts > 0) df.coalesce(smallParts) else df
    // a self-loop of weight w contributes 2w to its vertex's degree mass
    // (A_ii = 2w in the adjacency convention that keeps Q level-invariant
    // under contraction). Degree mass and m are loop constants — checkpoint
    // once instead of re-aggregating the adjacency every round.
    val deg = ck.lazily(shrink(adj.select(col("u"), col("w"))
      .unionAll(self.select(col("u"), (col("w") * 2L).as("w")))
      .groupBy("u").agg(sum(col("w")).as("k"))))
    // m is a loop-constant SCALAR: collect it once (single-row aggregate)
    // and inline it as a literal — no per-round broadcast cross-join.
    val m: Long = Option(wund.agg(sum(col("w"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    // Score overflow gate: the Long score `2m·kic − sigAdj·k` is bounded by
    // 4m² only through the CONTRACTED levels, where a super-vertex's kic/k
    // scale with total mass m rather than a single vertex's degree — at
    // m ≥ 2³⁰ the product can exceed 2⁶³ and wrap negative, silently
    // corrupting the argmax. Past the gate the score runs in decimal(38,0)
    // (exact to |score| < 10³⁸, i.e. m < ~1.5·10¹⁸); the argmax and
    // tie-break semantics are unchanged (LouvainSpec pins decimal-arm
    // parity). Conf forces the arm for testing.
    val useDecimal = spark.conf
      .get("spark.graft.louvain.decimalScore", "auto") match {
      case "true" => true
      case "false" => false
      case _ => m >= (1L << 30)
    }
    var labels = labels0
    (1 to rounds).foreach { r =>
      // k_{i,C}: weight from each vertex into each neighbor community.
      // The own community is always a candidate (k_{i,own} may be 0), so
      // a zero-weight own row rides the SAME aggregate — summing an extra
      // 0 is identity, and one groupBy replaces the former
      // kic-then-max-with-own two-aggregate chain (one exchange saved per
      // round).
      val pushedKic = adj
        .join(bc(labels.select(col("v").as("__nv"), col("c"))),
          col("v") === col("__nv"))
        .select(col("u"), col("c"), col("w"))
      val own = labels.select(col("v").as("u"), col("c"), lit(0L).as("w"))
      val cand = pushedKic.unionAll(own)
        .groupBy("u", "c").agg(sum(col("w")).as("kic"))
      // Σ_C: degree mass per community
      val sigma = labels
        .join(bc(deg.select(col("u").as("v"), col("k"))), "v")
        .groupBy("c").agg(sum(col("k")).as("sig"))
      val scored = cand
        .join(bc(sigma), "c")
        .join(bc(deg), "u")
        .join(bc(labels.select(col("v").as("u"), col("c").as("__cown"))), "u")
        // direction-alternating schedule (see scaladoc): own always stays
        // admissible because c = __cown satisfies both inequalities
        .where(if (r % 2 == 1) col("c") <= col("__cown")
               else col("c") >= col("__cown"))
        .withColumn("__sigAdj",
          when(col("c") === col("__cown"), col("sig") - col("k"))
            .otherwise(col("sig")))
        .withColumn("__score",
          if (useDecimal)
            lit(2L * m).cast("decimal(38,0)") * col("kic") -
              col("__sigAdj").cast("decimal(38,0)") * col("k")
          else lit(2L * m) * col("kic") - col("__sigAdj") * col("k"))
      labels = ck.lazily(shrink(scored
        .groupBy(col("u").as("v"))
        .agg(max(struct(col("__score"), (-col("c")).as("nc"))).as("__m"))
        .select(col("v"), (-col("__m.nc")).as("c"))))
    }
    labels
  }

  /** Phase 2 (Blondel §2): contract each community to a super-vertex.
    * Inter-community weights sum; `a = b` rows (community-internal weight
    * plus member self-loops) become the super-vertex's self-loop, so the
    * contracted graph's modularity under the identity labeling equals the
    * input labeling's — the level-invariance that makes multi-level
    * Louvain meaningful. One keyed aggregate over the (already
    * contracted, shrinking) weighted edge list. */
  def contract(wund: DataFrame, labels: DataFrame,
      broadcastLabels: Boolean = false): DataFrame = {
    def bc(df: DataFrame): DataFrame =
      if (broadcastLabels) broadcast(df) else df
    wund
      .join(bc(labels.select(col("v").as("a"), col("c").as("__ca"))), "a")
      .join(bc(labels.select(col("v").as("b"), col("c").as("__cb"))), "b")
      .select(least(col("__ca"), col("__cb")).as("a"),
        greatest(col("__ca"), col("__cb")).as("b"), col("w"))
      .groupBy("a", "b").agg(sum(col("w")).as("w"))
  }

  /** Full multi-level Louvain: `levels` × (move phase, contract), the
    * complete Blondel 2008 loop. Returns each ORIGINAL vertex's community
    * at the final level (community ids are vertex ids of the last
    * contracted graph = representatives from the original id space).
    * Every level is the same derandomized schedule, so the whole run is
    * bit-deterministic and SQL-unrollable (q156's two-level oracle). */
  def run(edges: DataFrame, roundsPerLevel: Int, levels: Int): DataFrame = {
    require(levels >= 1 && levels <= 8, "levels must be in [1, 8]")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val bcRows = spark.conf
      .get("spark.graft.louvain.broadcastThreshold", "2000000").toLong
    var wund = ck.lazily(undirected(edges))
    var mapping: DataFrame = null
    (1 to levels).foreach { level =>
      // the count gates the level's label-join strategy (broadcast vs
      // shuffle) and materializes the labels once ahead of their two
      // consumers (mapping composition + contraction)
      val (labels, nLabels) = ck.counted(phase1Weighted(wund, roundsPerLevel))
      val small = nLabels <= bcRows
      def bc(df: DataFrame): DataFrame = if (small) broadcast(df) else df
      mapping = if (level == 1) labels
      else ck.lazily(mapping.select(col("v"), col("c").as("__old"))
        .join(bc(labels.select(col("v").as("__old"), col("c"))), "__old")
        .select(col("v"), col("c")))
      if (level < levels)
        wund = ck.lazily(contract(wund, labels, broadcastLabels = small))
    }
    mapping
  }

  /** Per-community summary over a (v, community) labeling: member count,
    * internal edge count, degree mass, and the community's modularity
    * contribution `in_C/m − (Σ_C/2m)²` (scalar per-row double from exact
    * integers — no cross-row double sum). */
  def communityStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val bcRows = spark.conf
      .get("spark.graft.louvain.broadcastThreshold", "2000000").toLong
    val und = ck.lazily(edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct())
    // one count gates the three labels-build joins below (labels are often
    // a lazy plan over checkpointed phase-1 state whose default stats
    // would force shuffle joins) and pins labels for its three consumers
    val (lab, nLabels) = ck.counted(labels)
    def bc(df: DataFrame): DataFrame =
      if (nLabels <= bcRows) broadcast(df) else df
    val mDf = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("k"))
    val la = lab.select(col("v").as("a"), col("c").as("ca"))
    val lb = lab.select(col("v").as("b"), col("c").as("cb"))
    val internal = und.join(bc(la), "a").join(bc(lb), "b")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("internal_edges"))
    lab
      .join(deg, "v")
      .groupBy("c")
      .agg(count(lit(1)).as("n_members"), sum(col("k")).as("degree_sum"))
      .join(internal, Seq("c"), "left")
      .crossJoin(broadcast(mDf))
      .select(col("c").as("community"), col("n_members"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        col("degree_sum").cast("long").as("degree_sum"),
        round(
          coalesce(col("internal_edges"), lit(0L)).cast("double") / col("m") -
            (col("degree_sum").cast("double") / (lit(2L) * col("m"))) *
            (col("degree_sum").cast("double") / (lit(2L) * col("m"))), 8)
          .as("modularity_part"))
  }
}
