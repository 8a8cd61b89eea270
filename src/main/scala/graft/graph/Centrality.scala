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

  /** HITS hubs & authorities (Kleinberg 1999) over the DIRECTED edge set,
    * derandomized for cross-engine bit-equality: scores are exact longs
    * on a fixed integer scale, each half-round max-normalized with floor
    * division —
    *
    *   a(v) = ⌊ Σ_{u→v} h(u) · S / max_w Σ_{u→w} h(u) ⌋   (then h from a)
    *
    * Floor-div of exact longs is engine-independent (unlike the float
    * L2 normalization of textbook HITS, whose shuffle-order sums drift),
    * so fixed-round results are SQL-mirrorable. Max-normalization keeps
    * every intermediate ≤ degree·S ≤ 2⁶³ for any realistic graph
    * (S = 10⁴; safe to in-degrees of ~10¹⁴).
    *
    * Shape per round: two keyed aggregate+join passes over the edge list
    * (one per direction) plus a broadcast single-row max — the standard
    * power-iteration shuffle profile, rounds fixed by the caller, lineage
    * bounded by a lazy checkpoint per round. Vertices with no in-edges
    * (resp. out-edges) get authority (resp. hub) 0, like the zero rows of
    * the textbook iteration. */
  def hits(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    val S = 10000L
    val ck = Checkpointer(edges.sparkSession, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val verts = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    var hub = verts.withColumn("h", lit(S))
    var auth: DataFrame = null
    (1 to rounds).foreach { _ =>
      val aRaw = e.join(hub.select(col("id").as("src"), col("h")), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("h")).as("ar"))
      val aMax = aRaw.agg(max(col("ar")).as("am"))
      auth = ck.lazily(verts
        .join(aRaw, Seq("id"), "left")
        .crossJoin(broadcast(aMax))
        .select(col("id"),
          coalesce(expr("(ar * 10000) div am"), lit(0L)).as("a")))
      val hRaw = e.join(auth.select(col("id").as("dst"), col("a")), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("a")).as("hr"))
      val hMax = hRaw.agg(max(col("hr")).as("hm"))
      hub = ck.lazily(verts
        .join(hRaw, Seq("id"), "left")
        .crossJoin(broadcast(hMax))
        .select(col("id"),
          coalesce(expr("(hr * 10000) div hm"), lit(0L)).as("h")))
    }
    hub.join(auth, "id").select(col("id"), col("h").as("hub"),
      col("a").as("authority"))
  }

  private val L = 232792560L // lcm(1..20): exact 1/d terms for dist <= 20

  /** PageRank on a fixed integer scale (damping 0.85), derandomized the
    * [[hits]] way: per-vertex rank is an exact long, each round computes
    *
    *   pr'(v) = (15·S + 85 · Σ_{u→v} ⌊pr(u) / outdeg(u)⌋) div 100
    *
    * — floor divisions of exact longs, so fixed-round results are
    * bit-identical on any engine/partitioning and the oracle can unroll
    * the rounds verbatim (the float formulation's shuffle-order double
    * sums cannot be hash-gated; this is why plain PageRank stayed
    * spec-only until now). Dangling-vertex mass is dropped (the "no
    * dangling redistribution" variant); vertices with no in-edges settle
    * at the base 0.15·S.
    *
    * Shape per round: one outdeg-join projection of the rank onto edges
    * + one keyed sum — the standard power-iteration shuffle profile.
    * Intermediates are ≤ 85·V·S, far under 2⁶³ for any V·S a cluster
    * can hold. */
  def pageRankInt(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    val S = 1000000L
    val ck = Checkpointer(edges.sparkSession, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val verts = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("od"))
    var pr = verts.withColumn("pr", lit(S))
    (1 to rounds).foreach { _ =>
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(outdeg.select(col("id").as("src"), col("od")), "src")
        .select(col("dst").as("id"), expr("pr div od").as("ctr"))
        .groupBy("id").agg(sum(col("ctr")).as("inmass"))
      pr = ck.lazily(verts
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"(15 * ${S}L + 85 * coalesce(inmass, 0L)) div 100")
            .as("pr")))
    }
    pr
  }

  /** Personalized PageRank in the same integer-derandomized form as
    * [[pageRankInt]]: the restart mass returns to the SEED SET instead of
    * every vertex —
    *
    *   pr'(v) = (15·S·[v ∈ seeds] + 85 · Σ_{u→v} ⌊pr(u) / outdeg(u)⌋) div 100
    *
    * with `pr₀(v) = S·[v ∈ seeds]` — the "entities related to THESE
    * accounts" primitive (random walk with restart from a watchlist;
    * Jeh & Widom 2003's personalization vector, uniform over seeds).
    * All-long floor arithmetic → fixed-round results hash-gate against a
    * verbatim oracle unroll, exactly like [[pageRankInt]].
    *
    * Shape per round: identical to [[pageRankInt]] (one outdeg-join rank
    * projection + one keyed sum); the seed indicator rides the vertex
    * frame, so personalization adds no join. Mass never leaves the seed
    * component — non-reachable vertices stay at exactly 0. */
  def personalizedPageRankInt(edges: DataFrame, seeds: DataFrame,
      rounds: Int): DataFrame = {
    require(rounds >= 1 && rounds <= 16, "rounds must be in [1, 16]")
    val S = 1000000L
    val ck = Checkpointer(edges.sparkSession, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val verts = e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct()
    val outdeg = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("od"))
    val vs = ck.lazily(verts
      .join(seeds.select(col("id")).distinct().withColumn("__seed", lit(1L)),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("__seed"), lit(0L)).as("__seed")))
    var pr = vs.select(col("id"), (col("__seed") * S).as("pr"))
    (1 to rounds).foreach { _ =>
      val contrib = e
        .join(pr.select(col("id").as("src"), col("pr")), "src")
        .join(outdeg.select(col("id").as("src"), col("od")), "src")
        .select(col("dst").as("id"), expr("pr div od").as("ctr"))
        .groupBy("id").agg(sum(col("ctr")).as("inmass"))
      pr = ck.lazily(vs
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          expr(s"(15 * __seed * ${S}L + 85 * coalesce(inmass, 0L)) div 100")
            .as("pr")))
    }
    pr
  }

  /** Standard FLOAT PageRank run to a convergence tolerance — the
    * GraphFrames-default surface (`resetProb = 0.15`, tol-gated fixpoint)
    * for users who want the textbook semantics rather than the
    * hash-gatable integer form ([[pageRankInt]], which remains the
    * oracle-checked variant; float shuffle-order sums cannot be
    * bit-compared across engines, so this one is spec-covered only).
    *
    * Convergence is `max_v |pr'(v) − pr(v)| ≤ tol`, detected with the
    * [[Checkpointer.changeCounted]] accumulator probe during the
    * checkpoint-materializing scan (no extra aggregate stage, and retry
    * inflation can only add rounds). The per-round state is vertex-sized;
    * the exact vertex count taken once up front gates broadcasting it
    * into the edge joins (the SCC/CC adaptive-broadcast device). */
  def pageRank(edges: DataFrame, resetProb: Double = 0.15,
      tol: Double = 1e-4, maxIter: Int = 40): DataFrame = {
    require(resetProb > 0 && resetProb < 1, "resetProb must be in (0, 1)")
    require(tol > 0 && maxIter >= 1, "tol must be > 0, maxIter >= 1")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val bcRows = spark.conf
      .get("spark.graft.pagerank.broadcastThreshold", "2000000").toLong
    val (verts, nV) = ck.counted(e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct())
    def bc(df: DataFrame): DataFrame = if (nV <= bcRows) broadcast(df) else df
    val outdeg = ck.lazily(e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("od")))
    var pr = verts.withColumn("pr", lit(1.0))
    var it = 0
    var stable = false
    while (!stable && it < maxIter) {
      val contrib = e
        .join(bc(pr.select(col("id").as("src"), col("pr"))), "src")
        .join(bc(outdeg.select(col("id").as("src"), col("od"))), "src")
        .select(col("dst").as("id"), (col("pr") / col("od")).as("ctr"))
        .groupBy("id").agg(sum(col("ctr")).as("inmass"))
      val next = verts
        .join(contrib, Seq("id"), "left")
        .join(bc(pr.select(col("id"), col("pr").as("__prev"))), Seq("id"))
        .select(col("id"),
          (lit(resetProb) + lit(1.0 - resetProb) *
            coalesce(col("inmass"), lit(0.0))).as("pr"),
          col("__prev"))
      val (ckd, changed) = ck.changeCounted(next
        .withColumn("chg", abs(col("pr") - col("__prev")) > tol)
        .select("id", "pr", "chg"), "chg")
      stable = changed == 0L
      // per-round stats reset: pr rides the next round's plan TWICE
      // (contrib numerator + __prev delta), so the inherited sizeInBytes
      // estimate squares per round — the [[Checkpointer.fresh]] failure
      // mode (bit-length doubles; by round ~20 the driver burns minutes
      // in BigInteger multiplies inside the stats visitor, measured here)
      pr = ck.resetStats(ckd).select("id", "pr")
      it += 1
    }
    lastRounds.set(it)
    pr
  }

  /** Standard FLOAT HITS with L2 normalization per half-round, run to a
    * convergence tolerance — the textbook Kleinberg form next to the
    * hash-gatable integer [[hits]], same rationale as [[pageRank]]
    * (float = GraphFrames/networkx parity, spec-covered; integer = the
    * oracle-checked variant). Converges when both vectors move ≤ tol in
    * max-norm. */
  def hitsFloat(edges: DataFrame, tol: Double = 1e-4,
      maxIter: Int = 40): DataFrame = {
    require(tol > 0 && maxIter >= 1, "tol must be > 0, maxIter >= 1")
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    val e = ck.lazily(edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct())
    val bcRows = spark.conf
      .get("spark.graft.pagerank.broadcastThreshold", "2000000").toLong
    val (verts, nV) = ck.counted(e.select(col("src").as("id"))
      .unionAll(e.select(col("dst").as("id"))).distinct())
    def bc(df: DataFrame): DataFrame = if (nV <= bcRows) broadcast(df) else df
    def l2normalized(raw: DataFrame, c: String): DataFrame = {
      val nrm = raw.agg(sqrt(sum(col(c) * col(c))).as("__n"))
      raw.crossJoin(broadcast(nrm))
        .select(col("id"),
          when(col("__n") > 0.0, col(c) / col("__n")).otherwise(0.0).as(c))
    }
    val n0 = 1.0 / math.sqrt(nV.toDouble)
    var hub = verts.withColumn("h", lit(n0))
    var auth = verts.withColumn("a", lit(n0))
    var it = 0
    var stable = false
    while (!stable && it < maxIter) {
      val aRaw = verts.join(
          e.join(bc(hub.select(col("id").as("src"), col("h"))), "src")
            .groupBy(col("dst").as("id")).agg(sum(col("h")).as("ar")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("ar"), lit(0.0)).as("a"))
      val aNew = l2normalized(aRaw, "a")
      val hRaw = verts.join(
          e.join(bc(aNew.select(col("id").as("dst"), col("a"))), "dst")
            .groupBy(col("src").as("id")).agg(sum(col("a")).as("hr")),
          Seq("id"), "left")
        .select(col("id"), coalesce(col("hr"), lit(0.0)).as("h"))
      val hNew = l2normalized(hRaw, "h")
      val joined = hNew.join(aNew, "id")
        .join(bc(hub.select(col("id"), col("h").as("__ph"))), Seq("id"))
        .join(bc(auth.select(col("id"), col("a").as("__pa"))), Seq("id"))
      val (ckd, changed) = ck.changeCounted(joined
        .withColumn("chg",
          abs(col("h") - col("__ph")) > tol || abs(col("a") - col("__pa")) > tol)
        .select("id", "h", "a", "chg"), "chg")
      stable = changed == 0L
      // same per-round stats reset as [[pageRank]]: hub and auth each
      // appear twice in the next round's plan (contribution + __prev)
      val fresh = ck.resetStats(ckd)
      hub = fresh.select("id", "h")
      auth = fresh.select("id", "a")
      it += 1
    }
    lastRounds.set(it)
    hub.join(auth, "id")
      .select(col("id"), col("h").as("hub"), col("a").as("authority"))
  }

  /** Rounds taken by the most recent float fixpoint ([[pageRank]] /
    * [[hitsFloat]]) on the calling thread — spec instrumentation. */
  private[graft] val lastRounds: ThreadLocal[Integer] =
    ThreadLocal.withInitial(() => Integer.valueOf(0))

  /** Landmark betweenness centrality — bounded-horizon Brandes (2001)
    * with exact-integer dependency accumulation. Forward: level-
    * synchronous BFS from each landmark accumulating the shortest-path
    * counts σ (exact longs — σ(v) = Σ σ(u) over predecessors). Backward:
    * dependencies on a fixed integer scale,
    *
    *   δ(v) = Σ_{w succ} ⌊ σ(v) · (S + δ(w)) / σ(w) ⌋      (S = 10⁴)
    *
    * — the Brandes recurrence with the rational σ_v/σ_w quantized by
    * floor division, so every value is an exact long and fixed-horizon
    * results are engine/partitioning-bit-identical (the float recurrence
    * would drift per shuffle order). Output per vertex: Σ over landmarks
    * of δ·(quantized) — the Eppstein–Wang-style sampled estimator of
    * betweenness scaled by S (exact betweenness · S when landmarks =
    * all vertices and horizon ≥ diameter).
    *
    * Shape: `maxLevels` forward rounds (frontier×adjacency join + keyed
    * σ-sum + anti-join against settled) and `maxLevels` backward rounds
    * (level-(d) δ joined onto level-(d−1) through the adjacency) — all
    * keyed equi-joins over (landmark, vertex) pairs; state is one row per
    * settled (landmark, vertex); per-round lineage checkpointed. K
    * landmarks = O(K·E) work total, the sampled-centrality scale recipe
    * (exact all-pairs Brandes is O(V·E) — impossible at 100 TB). */
  def betweennessInt(edges: DataFrame, landmarks: Seq[Long],
      maxLevels: Int): DataFrame = {
    require(landmarks.nonEmpty && maxLevels >= 1 && maxLevels <= 12,
      "need landmarks and maxLevels in [1, 12]")
    val S = 10000L
    val spark = edges.sparkSession
    val ck = Checkpointer(spark, None)
    import spark.implicits._
    val und = edges.select(
        least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val adj = ck.lazily(
      und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v"))))
    // ---- forward: levels(d) = (landmark, v, sigma) settled at depth d ----
    val init = landmarks.toDF("landmark")
      .select(col("landmark"), col("landmark").as("v"), lit(1L).as("sigma"))
    var levels = Vector(ck.lazily(init))
    var settled = init.select("landmark", "v")
    (1 to maxLevels).foreach { _ =>
      val nxt = levels.last
        .join(adj.select(col("u").as("v"), col("v").as("__nv")), "v")
        .select(col("landmark"), col("__nv").as("v"), col("sigma"))
        .join(settled, Seq("landmark", "v"), "left_anti")
        .groupBy("landmark", "v").agg(sum(col("sigma")).as("sigma"))
      val lvl = ck.lazily(nxt)
      levels = levels :+ lvl
      settled = ck.lazily(settled.unionAll(lvl.select("landmark", "v")))
    }
    // ---- backward: delta per level, top level has delta 0 ----
    var deltas = Vector.fill(maxLevels + 1)(null: DataFrame)
    deltas = deltas.updated(maxLevels,
      levels(maxLevels).select(col("landmark"), col("v"), lit(0L).as("delta")))
    (maxLevels - 1 to 1 by -1).foreach { d =>
      val succ = levels(d + 1)
        .join(deltas(d + 1), Seq("landmark", "v"))
        .select(col("landmark"), col("v").as("__w"),
          col("sigma").as("__sw"), col("delta").as("__dw"))
      val contrib = levels(d)
        .join(adj.select(col("u").as("v"), col("v").as("__w")), "v")
        .join(succ, Seq("landmark", "__w"))
        .groupBy("landmark", "v")
        .agg(sum(expr(s"(sigma * (${S}L + __dw)) div __sw")).as("delta"))
      deltas = deltas.updated(d, ck.lazily(
        levels(d).select("landmark", "v")
          .join(contrib, Seq("landmark", "v"), "left")
          .select(col("landmark"), col("v"),
            coalesce(col("delta"), lit(0L)).as("delta"))))
    }
    val all = (1 until maxLevels).map(deltas(_))
      .reduceOption(_ unionAll _)
      .getOrElse(deltas(maxLevels).limit(0))
    all.groupBy(col("v").as("id"))
      .agg(sum(col("delta")).as("betweenness_q"))
  }

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
