package graft.queries

import org.apache.spark.sql.execution.FormattedMode

import graft.SparkTestBase

/** Plan-quality regression gate: the physical-plan properties PLANS.md
  * documents are asserted here so they cannot silently regress — no
  * cartesian products anywhere, nested-loop joins only where a small
  * broadcast side crossed with a single corpus scan is the intended shape,
  * and filters reaching the parquet scans. Runs against sf0.001 (plan
  * structure, not data volume, is under test).
  */
class PlanSpec extends SparkTestBase {
  private val dir = "/root/testdata/sf0.001"

  /** BNLJ is legitimate only where a deliberately-broadcast small side is
    * crossed with one corpus scan: the brute-force top-k query set (q28),
    * IVF centroid scoring (q40), q26/q27's assembly of single-row
    * assertion aggregates, and the single-row corpus-total broadcasts in
    * q71 (token total) and q73 (heavy-hitter threshold). Everything else
    * must equi-join. */
  private val bnljWhitelist =
    Set("q28_cosine_topk", "q89_quantized_topk", "q40_ann_ivf",
      "q26_minhash_lsh", "q27_simhash", "q91_minhash_chained",
      "q71_unigram_lm", "q73_approx_heavy_words", "q92_bm25_topk",
      "q94_text_dedup_clusters",
      // broadcast-query ANN scans with non-equi predicates (self-exclusion
      // / label inequality riding the broadcast join) — the q28 pattern
      "q97_hard_negatives", "q98_knn_predict",
      // broadcast cross of a single-row aggregate (T_max) — the q71 pattern
      "q99_mixture_resample",
      // broadcast of the tiny query set (LSH arm) / per-query ADC tables
      "q101_ann_recall", "q103_pq_topk",
      // broadcast(centroids) coarse assignment + query probing crosses
      "q105_ivfpq_topk",
      // broadcast cross of a single-row aggregate (funnel base cohort /
      // basket total N / corpus size N) — the q71 pattern
      "q113_funnel", "q115_copurchase_lift", "q118_tfidf_cosine",
      "q121_target_encoding",
      // broadcast cross of single-row aggregates: pair total N (q130),
      // row total + per-range offsets (q131), per-FK scalar count pairs
      // (q132), vocabulary size V (q133), edge count m (q135, and per
      // level in the full multi-level run, q156)
      "q130_ppmi", "q131_quantile_bins", "q132_fk_integrity",
      "q133_bigram_lm", "q135_louvain", "q156_louvain_full",
      // broadcast cross of the single-row grand total N for the
      // independence-expected counts (Stats.chiSquare)
      "q147_chi2_independence",
      // the q105 IVF-PQ probing crosses + broadcast(query vectors) re-rank
      "q148_ivfpq_rerank",
      // broadcast(k centroids) assignment cross over one corpus scan —
      // the q40 pattern (Lloyd update step)
      "q159_kmeans_profile",
      // the dense-ranking arm is q28's broadcast-query non-equi scan;
      // fusion itself is keyed
      "q163_rrf_hybrid",
      // broadcast non-equi (type_l < type_r) pairing of the k-row
      // per-audience sketch table with itself — k(k−1)/2 rows total
      "q157_audience_overlap_hll",
      // broadcast cross of the single-row horizon/total aggregate onto
      // the per-user spans — the q71 pattern
      "q161_kaplan_meier",
      // broadcast cross of the single-row CMS sketch onto the probe
      // rows — the q71 pattern
      "q166_cms_frequency",
      // broadcast cross of the two single-row record/unlinkable counters
      // — the q71 pattern
      "q169_er_unlinkables",
      // broadcast cross of the four single-row streaming-dedup invariant
      // aggregates — the q94 pattern
      "q181_stream_neardup_sink")

  private lazy val plans: Map[String, String] =
    graft.SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, dir).queryExecution.explainString(FormattedMode)
    }

  test("no registered query plans a CartesianProduct") {
    val bad = plans.filter(_._2.contains("CartesianProduct")).keys.toSeq.sorted
    assert(bad.isEmpty, s"cartesian products in: $bad")
  }

  test("BroadcastNestedLoopJoin only on whitelisted broadcast-scan queries") {
    val bad = plans.filter { case (n, p) =>
      p.contains("BroadcastNestedLoopJoin") && !bnljWhitelist(n)
    }.keys.toSeq.sorted
    assert(bad.isEmpty, s"unexpected BNLJ in: $bad")
  }

  test("the registered near-dup scale path has no nested-loop join") {
    assert(!plans("q29_cosine_neardup").contains("BroadcastNestedLoopJoin"))
  }

  test("filters are pushed down to the parquet scans") {
    // the ANN query-set filters must reach the embeddings scan, not run
    // post-read
    assert(plans("q28_cosine_topk").contains("LessThan(vec_id,8)"),
      "vec_id filter not pushed in q28")
    assert(plans("q30_ann_lsh").contains("LessThan(vec_id,8)"),
      "vec_id filter not pushed in q30")
    // and broadly: a healthy fraction of registered queries push something
    val pushing = plans.count(_._2.matches("(?s).*PushedFilters: \\[[^\\]].*"))
    assert(pushing >= 10, s"only $pushing queries push filters to their scans")
  }

  test("q44's motif pipeline is one visible plan, not an eager checkpoint") {
    // q44 used to localCheckpoint the motif ids mid-query (severing the
    // visible plan from the parquet scans); it now reuses the motif rows
    // in-plan via explode. Iterative queries (CC/SCC/Pregel) legitimately
    // end in checkpoint-backed RDD scans — their loops are eager by nature
    // — so this assertion is q44's alone.
    assert(!plans("q44_motif_structuring5").contains("Scan ExistingRDD"),
      "q44 hides its scans behind an eager checkpoint")
    assert(plans("q44_motif_structuring5").contains("Scan parquet"),
      "q44 should read its sources in-plan")
  }

  test("q141's FINAL adaptive plan reuses part of the prefix-index upstream") {
    // The set-join candidate generator plans the prefix-index upstream
    // (scan → dedup → freq → size → window) for four consumers; AQE's
    // runtime exchange reuse recovers only part of that duplication
    // (measured at sf0.1: 2 ReusedExchange against 7 planned upstream
    // copies — the fact behind the reusePrefix knob's crossover,
    // SetJoin.scala). PLANS.md's main table records INITIAL plans, where
    // reuse is still a guess; this executes the query's own
    // QueryExecution and asserts on the FINALIZED AdaptiveSparkPlan so
    // the partial-reuse claim is regression-guarded: losing all reuse
    // (or the plan silently going non-adaptive) fails here.
    val qe = graft.SparkEntry.queries("q141_basket_jaccard")(spark, dir)
      .queryExecution
    qe.toRdd.foreach(_ => ()) // execute THIS plan; AQE finalizes in place
    val p = qe.explainString(FormattedMode)
    val (finalPart, _) = graft.FinalPlans.sections(p)
    assert(p.contains("isFinalPlan=true"), "q141 plan did not finalize")
    val reused = finalPart.linesIterator.count(_.contains("ReusedExchange"))
    assert(reused >= 1,
      s"expected ≥1 ReusedExchange in q141's final adaptive plan, got $reused")
  }
}
