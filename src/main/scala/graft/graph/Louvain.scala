package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Louvain community detection, phase 1 (Blondel et al. 2008): each vertex
  * repeatedly moves to the neighboring community with the best modularity
  * gain. The reference analyzes transaction-graph communities implicitly
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
  * dropped — sign- and order-preserving). All quantities are exact longs
  * (safe while 2m·max-degree < 2⁶³ — at 10¹² edges that allows degrees to
  * ~4·10⁶), ties break toward the smallest community id, so rounds are
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

  /** `rounds` synchronous move rounds from singleton communities.
    * Returns (v, community). */
  def phase1(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 32, "rounds must be in [1, 32]")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val adj = ck.lazily(
      und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v"))))
    val deg = adj.groupBy("u").agg(count(lit(1)).as("k"))
    val mDf = und.agg(count(lit(1)).as("m"))
    var labels = adj.select(col("u").as("v")).distinct()
      .withColumn("c", col("v"))
    (1 to rounds).foreach { r =>
      // k_{i,C}: edge count from each vertex into each neighbor community
      val kic = adj
        .join(labels.select(col("v").as("__nv"), col("c")),
          col("v") === col("__nv"))
        .groupBy(col("u"), col("c")).agg(count(lit(1)).as("kic"))
      // own community is always a candidate (k_{i,own} may be 0)
      val own = labels.select(col("v").as("u"), col("c"), lit(0L).as("kic"))
      val cand = kic.unionAll(own)
        .groupBy("u", "c").agg(max("kic").as("kic"))
      // Σ_C: degree mass per community
      val sigma = labels
        .join(deg.select(col("u").as("v"), col("k")), "v")
        .groupBy("c").agg(sum(col("k")).as("sig"))
      val scored = cand
        .join(sigma, "c")
        .join(deg, "u")
        .join(labels.select(col("v").as("u"), col("c").as("__cown")), "u")
        // direction-alternating schedule (see scaladoc): own always stays
        // admissible because c = __cown satisfies both inequalities
        .where(if (r % 2 == 1) col("c") <= col("__cown")
               else col("c") >= col("__cown"))
        .crossJoin(broadcast(mDf))
        .withColumn("__sigAdj",
          when(col("c") === col("__cown"), col("sig") - col("k"))
            .otherwise(col("sig")))
        .withColumn("__score",
          lit(2L) * col("m") * col("kic") - col("__sigAdj") * col("k"))
      labels = ck.lazily(scored
        .groupBy(col("u").as("v"))
        .agg(max(struct(col("__score"), (-col("c")).as("nc"))).as("__m"))
        .select(col("v"), (-col("__m.nc")).as("c")))
    }
    labels
  }

  /** Per-community summary over a (v, community) labeling: member count,
    * internal edge count, degree mass, and the community's modularity
    * contribution `in_C/m − (Σ_C/2m)²` (scalar per-row double from exact
    * integers — no cross-row double sum). */
  def communityStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val mDf = und.agg(count(lit(1)).as("m"))
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("k"))
    val la = labels.select(col("v").as("a"), col("c").as("ca"))
    val lb = labels.select(col("v").as("b"), col("c").as("cb"))
    val internal = und.join(la, "a").join(lb, "b")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("c")).agg(count(lit(1)).as("internal_edges"))
    labels
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
