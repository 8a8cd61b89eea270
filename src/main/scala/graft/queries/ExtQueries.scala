package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.ext.{ClusterKeep, Eval, Multimodal, Pca, Retrieval, Similarity, TextAnalysis, TextDedup}
import graft.streaming.Streams

/** LLM-data-pipeline extension coverage (north-star operators beyond the
  * reference surface, SURVEY.md §7.5): deduplication, similarity search,
  * text analysis, multimodal plumbing, and windowed/sessionized event
  * aggregation — over the `documents`, `embeddings`, and `events` tables.
  *
  * Hash-dependent operators (MinHash/SimHash/hyperplane-LSH use Spark's
  * xxhash64, which DuckDB cannot reproduce) carry PROVABLE-invariant
  * oracles — containment in the exact pair set, identical similarity
  * values, guaranteed-recall subsets — instead of value mirrors; the
  * empirical behavior is additionally spec-tested. Everything else carries
  * a direct DuckDB value oracle.
  */
object ExtQueries {

  // ---------- deduplication ----------

  /** Exact dedup: canonical id per identical text (min doc_id). */
  private val q24 = QDef(
    "q24_dedup_exact",
    (s, dir) => TextDedup
      .exactCanonical(Tables.load(s, dir, "documents"), "doc_id", "text")
      .select(col("doc_id"), col("canonical_id"), col("is_duplicate"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   min(doc_id) OVER (PARTITION BY text) AS canonical_id,
                   doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_duplicate
            FROM documents ORDER BY doc_id"""))

  private val ShingleN = 5

  /** Exact 5-gram Jaccard near-dup pairs via the shingle inverted index.
    * 5-word shingles are near-unique even over a small vocabulary, so the
    * index join has no hot keys (SURVEY.md scale risk). */
  private val q25 = QDef(
    "q25_ngram_jaccard",
    (s, dir) => TextDedup
      .jaccardPairs(Tables.load(s, dir, "documents"), "doc_id", "text", ShingleN, 0.5)
      .orderBy("id_l", "id_r"),
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            sh AS MATERIALIZED (
              SELECT DISTINCT a.doc_id,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS id_l, y.doc_id AS id_r, count(*) AS common
              FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY 1, 2)
            SELECT id_l, id_r,
                   CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_l
            JOIN sizes sb ON sb.doc_id = id_r
            WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
            ORDER BY id_l, id_r"""))

  /** MinHash+LSH near-dup (16 perms, 4 bands), oracle-checked on the
    * *guaranteed* directions only (16 perms at 4 bands catches a
    * jaccard-0.5 pair with probability ~23%, so pinning full recall would
    * encode a property of one corpus, not of the operator):
    *
    *  - every identical-text pair (with ≥ n words, so it shingles) MUST be
    *    found — identical shingle sets give identical signatures, identical
    *    band hashes, a guaranteed bucket collision, and verification
    *    jaccard 1;
    *  - no reported pair may fall outside the exact-Jaccard ≥ 0.5 set, and
    *    reported jaccard values must equal the exact pipeline's bit-for-bit
    *    — candidate verification runs the same integer-count arithmetic.
    *
    * Both counts are genuinely computed in Spark; DuckDB reproduces the
    * identical-pair and exact-pair counts and pins the provable zeros.
    * Probabilistic recall on *near*- (not exact-) duplicates is reported in
    * DedupSpec as data, with tolerance, not hash-gated. */
  private val q26 = QDef(
    "q26_minhash_lsh",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val exact = TextDedup.jaccardPairs(docs, "doc_id", "text", ShingleN, 0.5)
        .select(col("id_l"), col("id_r"), col("jaccard").as("j_exact"))
        .localCheckpoint()
      val lsh = TextDedup.minhashLshPairs(docs, "doc_id", "text",
          ShingleN, numPerm = 16, bands = 4, threshold = 0.5)
        .select(col("id_l"), col("id_r"), col("jaccard").as("j_lsh"))
        .localCheckpoint()
      // identical-text pairs long enough to shingle (< n words → no
      // shingles → outside both pipelines by construction)
      val d = docs.select(col("doc_id"), col("text"))
        .filter(size(TextDedup.words(col("text"))) >= ShingleN)
      val ed = d.as("x").join(d.as("y"),
          col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_l"), col("y.doc_id").as("id_r"))
      val a1 = exact.agg(count(lit(1)).as("n_exact_pairs"))
      val a2 = ed.join(lsh, Seq("id_l", "id_r"), "left_semi")
        .agg(count(lit(1)).as("n_exact_dup_pairs_found"))
      val a3 = ed.join(lsh, Seq("id_l", "id_r"), "left_anti")
        .agg(count(lit(1)).as("n_exact_dup_pairs_missed"))
      val a4 = lsh.join(exact, Seq("id_l", "id_r"), "left_anti")
        .agg(count(lit(1)).as("n_false_positive_pairs"))
      val a5 = lsh.join(exact, Seq("id_l", "id_r"))
        .agg(count(when(col("j_lsh") =!= col("j_exact"), 1)).as("n_jaccard_mismatches"))
      a1.crossJoin(a2).crossJoin(a3).crossJoin(a4).crossJoin(a5)
    },
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            sh AS MATERIALIZED (
              SELECT DISTINCT a.doc_id,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS id_l, y.doc_id AS id_r, count(*) AS common
              FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
            ep AS (
              SELECT id_l, id_r
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_l
              JOIN sizes sb ON sb.doc_id = id_r
              WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5),
            ed AS (
              SELECT x.doc_id AS id_l, y.doc_id AS id_r
              FROM documents x JOIN documents y
                ON x.text = y.text AND x.doc_id < y.doc_id
              WHERE len(string_split_regex(lower(x.text), '\s+')) >= 5)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM ep) AS n_exact_pairs,
                   (SELECT CAST(count(*) AS BIGINT) FROM ed) AS n_exact_dup_pairs_found,
                   CAST(0 AS BIGINT) AS n_exact_dup_pairs_missed,
                   CAST(0 AS BIGINT) AS n_false_positive_pairs,
                   CAST(0 AS BIGINT) AS n_jaccard_mismatches"""))

  /** Chain-contracted MinHash-LSH dedup edges
    * ([[TextDedup.minhashLshEdgesChained]] — q26's banding with c−1
    * consecutive-by-id candidates per bucket instead of the O(c²)
    * self-join). Oracle-checked on the provable invariants (bucket ids are
    * xxhash64-dependent, so DuckDB cannot enumerate them):
    *
    *  - no chained edge may fall outside the exact-Jaccard ≥ 0.5 set, and
    *    reported jaccard values must be bit-equal to the exact pipeline's
    *    (same integer-count verification arithmetic);
    *  - connected components over the chained edges must REFINE the
    *    pairwise-LSH components — every chain candidate is a bucket
    *    collision, so a verified chain edge is always a pairwise edge too;
    *    a single coarsening would mean the chain invented a link.
    *
    * All counts are genuinely computed in Spark (two LSH pipelines + two
    * CC runs); DuckDB reproduces the exact-pair count and pins the provable
    * zeros. Clone-cluster linearity (c−1 candidates for c clones) and
    * component equality on clone clusters are asserted in DedupSpec. */
  private val q91 = QDef(
    "q91_minhash_chained",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // one shingle index + one banding, shared by all three strategies —
      // the comparison is about CANDIDATE generation, so the front end
      // (shingling, signatures, buckets) is computed exactly once
      val (sh, buckets0) = TextDedup.minhashBuckets(docs, "doc_id", "text",
        ShingleN, numPerm = 16, bands = 4)
      val buckets = buckets0.localCheckpoint()
      val exact = TextDedup.jaccardPairsOn(sh, 0.5)
        .select(col("id_l"), col("id_r"), col("jaccard").as("j_exact"))
        .localCheckpoint()
      val chained = TextDedup.jaccardFromCounts(sh,
          TextDedup.candidateCommonCounts(sh, TextDedup.chainCandidates(buckets)), 0.5)
        .select(col("id_l"), col("id_r"), col("jaccard").as("j_ch"))
        .localCheckpoint()
      val pairwise = TextDedup.jaccardFromCounts(sh,
          TextDedup.candidateCommonCounts(sh, TextDedup.pairCandidates(buckets)), 0.5)
        .select(col("id_l"), col("id_r"))
      val a1 = exact.agg(count(lit(1)).as("n_exact_pairs"))
      val a2 = chained.join(exact, Seq("id_l", "id_r"), "left_anti")
        .agg(count(lit(1)).as("n_false_positive_pairs"))
      val a3 = chained.join(exact, Seq("id_l", "id_r"))
        .agg(count(when(col("j_ch") =!= col("j_exact"), 1)).as("n_jaccard_mismatches"))
      val ccC = graft.graph.ConnectedComponents.runOnEdges(
        chained.select(col("id_l").as("src"), col("id_r").as("dst")))
      val ccP = graft.graph.ConnectedComponents.runOnEdges(
        pairwise.select(col("id_l").as("src"), col("id_r").as("dst")))
      val a4 = ccC.join(ccP.withColumnRenamed("component", "pc"), "id")
        .groupBy(col("component")).agg(countDistinct(col("pc")).as("k"))
        .agg(count(when(col("k") > 1, 1)).as("n_refinement_violations"))
      a1.crossJoin(a2).crossJoin(a3).crossJoin(a4)
    },
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            sh AS MATERIALIZED (
              SELECT DISTINCT a.doc_id,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS id_l, y.doc_id AS id_r, count(*) AS common
              FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc_id < y.doc_id
              GROUP BY 1, 2),
            ep AS (
              SELECT id_l, id_r
              FROM inter
              JOIN sizes sa ON sa.doc_id = id_l
              JOIN sizes sb ON sb.doc_id = id_r
              WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5)
            SELECT (SELECT CAST(count(*) AS BIGINT) FROM ep) AS n_exact_pairs,
                   CAST(0 AS BIGINT) AS n_false_positive_pairs,
                   CAST(0 AS BIGINT) AS n_jaccard_mismatches,
                   CAST(0 AS BIGINT) AS n_refinement_violations"""))

  /** SimHash near-dup (64-bit, pigeonhole chunk blocking, Hamming ≤ 6),
    * oracle-checked on the *provable* assertions only (fingerprints are
    * xxhash64-dependent, so DuckDB cannot enumerate the pair set): every
    * identical-text pair MUST be found — identical text → identical
    * fingerprint → Hamming 0, and 7-chunk pigeonhole blocking has recall 1
    * at Hamming ≤ 6 by construction. Both the found and missed counts are
    * genuinely computed in Spark; DuckDB reproduces the identical-pair
    * count and pins the provable zero. The *empirical* correlations
    * (5-gram-Jaccard ≥ 0.5 pairs landing within Hamming 6, reported pairs
    * having non-trivial unigram overlap) hold on this corpus but are not
    * operator guarantees — DedupSpec reports them with tolerances. */
  private val q27 = QDef(
    "q27_simhash",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      // the simhash pipeline is read by both assertions — truncate once
      val sim = TextDedup.simhashPairs(docs, "doc_id", "text", maxDist = 6)
        .localCheckpoint()
      val d = docs.select(col("doc_id"), col("text"))
      val ed = d.as("x").join(d.as("y"),
          col("x.text") === col("y.text") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_l"), col("y.doc_id").as("id_r"))
      val a1 = ed.join(sim, Seq("id_l", "id_r"), "left_semi")
        .agg(count(lit(1)).as("n_exact_dup_pairs_found"))
      val a2 = ed.join(sim, Seq("id_l", "id_r"), "left_anti")
        .agg(count(lit(1)).as("n_exact_dup_pairs_missed"))
      a1.crossJoin(a2)
    },
    Some("""WITH ed AS (
              SELECT x.doc_id AS id_l, y.doc_id AS id_r
              FROM documents x JOIN documents y
                ON x.text = y.text AND x.doc_id < y.doc_id)
            SELECT CAST(count(*) AS BIGINT) AS n_exact_dup_pairs_found,
                   CAST(0 AS BIGINT) AS n_exact_dup_pairs_missed
            FROM ed"""))

  // ---------- similarity search ----------

  private def embeddings(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Brute-force cosine top-5 for a fixed query set — the ANN correctness
    * baseline. Sequential-order double arithmetic matches DuckDB
    * list_dot_product bit-for-bit. */
  private val q28 = QDef(
    "q28_cosine_topk",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
                       FROM embeddings WHERE vec_id < 8),
                 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv
                       FROM embeddings),
                 sc AS (
                   SELECT query_id, neighbor_id,
                          list_dot_product(qv, nv) /
                            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
                   FROM q JOIN c ON query_id <> neighbor_id),
                 r AS (SELECT *, row_number() OVER (
                         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                       FROM sc)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Top-5 over int8-quantized embeddings — the 4×-compressed ANN scan
    * path. Full-strength oracle: quantization is deterministic double
    * arithmetic (`floor(x*127/maxabs + 0.5)` — NOT `round`, whose
    * half-way behavior differs between Scala and DuckDB on negatives) and
    * the code dot products are exact small integers, so both engines
    * produce bit-identical scores. */
  private val q89 = QDef(
    "q89_quantized_topk",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.quantizedTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding", 5)
        .orderBy("query_id", "rank")
    },
    Some("""WITH base AS (
              SELECT vec_id, embedding::DOUBLE[] AS v,
                     list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) AS maxabs
              FROM embeddings),
            qz AS (
              SELECT vec_id,
                     CASE WHEN maxabs = 0 THEN list_transform(v, x -> 0.0)
                          ELSE list_transform(v, x -> floor(x * 127.0 / maxabs + 0.5))
                     END AS c
              FROM base),
            q AS (SELECT vec_id AS query_id, c AS qc FROM qz WHERE vec_id < 8),
            sc AS (
              SELECT query_id, vec_id AS neighbor_id,
                     CASE WHEN list_dot_product(qc, qc) = 0
                            OR list_dot_product(c, c) = 0 THEN 0.0
                          ELSE list_dot_product(qc, c) /
                               (sqrt(list_dot_product(qc, qc)) * sqrt(list_dot_product(c, c)))
                     END AS cosine_q
              FROM q JOIN qz ON query_id <> vec_id),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY cosine_q DESC, neighbor_id) AS rank
                  FROM sc)
            SELECT query_id, neighbor_id, cosine_q, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** DuckDB rendering of a vector-cosine over `DOUBLE[]` expressions —
    * left-to-right IEEE arithmetic identical to the codegen'd `cosine_sim`
    * expression (bit-equality proven by q28). */
  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** DuckDB mirror of [[Similarity.lshBucket]] over `ve`: sum of 2^i for
    * each hyperplane with a non-negative projection. The plane literals are
    * printed with Double.toString, which round-trips to the identical
    * double, so both engines compute bit-identical projections and
    * therefore identical buckets — the oracle replicates the bucketing
    * semantics exactly rather than assuming any recall. */
  private def bucketSql(planes: Seq[Array[Double]]): String =
    planes.zipWithIndex.map { case (p, i) =>
      val lits = p.mkString("[", ",", "]")
      s"(CASE WHEN list_dot_product(ve, $lits) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  // 8 bands × 8 planes: candidate pairs ≈ 6% of all pairs on isotropic
  // random vectors (equi-join, no cross product); recall at the threshold
  // is parameter-tunable and is spec-tested on planted near-dups — the
  // oracle below mirrors the banding itself, so the gate checks engine
  // equivalence independent of recall. Threshold 0.45 ≈ the top decile of
  // pair similarity in the synthetic corpus (max pair cosine: 0.51 at
  // sf0.01, 0.60 at sf0.1 — no planted duplicates exist in it).
  private val NdBands = 8
  private val NdRowsPerBand = 8
  private val NdThreshold = 0.45

  /** Embedding near-dup pairs via banded hyperplane LSH — the 100 TB scale
    * path: candidates from an equi-join on (band, bucket), exact cosine
    * verification of candidates only, no O(n²) cross product anywhere
    * (the r1-registered all-pairs BNLJ formulation is retained only as the
    * SimilaritySpec baseline). The oracle mirrors the full banded-bucket
    * semantics in SQL (hyperplanes are literal arrays, not hashes), so this
    * is a complete value-hash check, not a containment bound. */
  private val q29 = QDef(
    "q29_cosine_neardup",
    (s, dir) => Similarity
      .neardupPairsBanded(embeddings(s, dir), "vec_id", "embedding",
        NdThreshold, bands = NdBands, rowsPerBand = NdRowsPerBand, dim = 64)
      .orderBy("id_l", "id_r"),
    Some {
      val planes = Similarity.hyperplanes(NdBands * NdRowsPerBand, 64)
      val bandArms = (0 until NdBands).map { b =>
        val slice = planes.slice(b * NdRowsPerBand, (b + 1) * NdRowsPerBand)
        s"SELECT vec_id AS id, $b AS band, ${bucketSql(slice)} AS bucket FROM v"
      }.mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          bk AS ($bandArms),
          cand AS (SELECT DISTINCT a.id AS id_l, b.id AS id_r
                   FROM bk a JOIN bk b
                     ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          p AS (SELECT id_l, id_r, ${cosSql("va.ve", "vb.ve")} AS cosine
                FROM cand
                JOIN v va ON va.vec_id = id_l
                JOIN v vb ON vb.vec_id = id_r)
          SELECT id_l, id_r, cosine FROM p
          WHERE cosine >= $NdThreshold ORDER BY id_l, id_r"""
    })

  private val SemThreshold = 0.30

  /** SemDeDup-style semantic deduplication over the embedding corpus:
    * banded-LSH near-dup pairs (the q29 scale path at a looser threshold)
    * joined with q32's quality scores; each pair drops its lower-quality
    * member (ties drop the higher id). The oracle mirrors the complete
    * banding + quality + drop-rule pipeline in SQL — a full value-hash
    * check of the composed curation verdict for every document. */
  private val q62 = QDef(
    "q62_semantic_dedup",
    (s, dir) => {
      val quality = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      Similarity.semanticDedup(embeddings(s, dir), quality, "vec_id", "embedding",
          SemThreshold, bands = NdBands, rowsPerBand = NdRowsPerBand, dim = 64)
        .select(col("id").as("doc_id"), col("quality"), col("is_dropped"))
        .orderBy("doc_id")
    },
    Some {
      val planes = Similarity.hyperplanes(NdBands * NdRowsPerBand, 64)
      val bandArms = (0 until NdBands).map { b =>
        val slice = planes.slice(b * NdRowsPerBand, (b + 1) * NdRowsPerBand)
        s"SELECT vec_id AS id, $b AS band, ${bucketSql(slice)} AS bucket FROM v"
      }.mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          bk AS ($bandArms),
          cand AS (SELECT DISTINCT a.id AS id_l, b.id AS id_r
                   FROM bk a JOIN bk b
                     ON a.band = b.band AND a.bucket = b.bucket AND a.id < b.id),
          np AS (SELECT id_l, id_r
                 FROM (SELECT id_l, id_r, ${cosSql("va.ve", "vb.ve")} AS cosine
                       FROM cand
                       JOIN v va ON va.vec_id = id_l
                       JOIN v vb ON vb.vec_id = id_r)
                 WHERE cosine >= $SemThreshold),
          q AS (SELECT doc_id AS id,
                       least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5 +
                         (CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
                          / len(string_split_regex(lower(text), '\\s+'))) * 0.5 AS quality
                FROM documents),
          drops AS (SELECT DISTINCT
                           CASE WHEN ql.quality < qr.quality THEN id_l
                                WHEN qr.quality < ql.quality THEN id_r
                                ELSE greatest(id_l, id_r) END AS id
                    FROM np
                    JOIN q ql ON ql.id = np.id_l
                    JOIN q qr ON qr.id = np.id_r)
          SELECT q.id AS doc_id, q.quality, drops.id IS NOT NULL AS is_dropped
          FROM q LEFT JOIN drops ON q.id = drops.id
          ORDER BY doc_id"""
    })

  /** Cluster-contracted semantic dedup ([[Similarity.semanticDedupClusters]]):
    * chain edges per (band, bucket) — consecutive-by-id members only, linear
    * in corpus size even for a million-clone cluster — verified by exact
    * cosine, contracted through min-id connected components, then exactly
    * one best-quality keeper per component. The oracle mirrors the whole
    * pipeline in SQL: plane-literal buckets, `lag` chain edges, the same
    * cosine verification, recursive-CTE reachability for the components,
    * and a deterministic (quality DESC, id ASC) keep rule — a full
    * value-hash check of the composed verdict. */
  private val q88 = QDef(
    "q88_semantic_dedup_clusters",
    (s, dir) => {
      val quality = Tables.load(s, dir, "documents")
        .select(col("doc_id").as("id"),
          TextAnalysis.qualityScore(col("text")).as("quality"))
      Similarity.semanticDedupClusters(embeddings(s, dir), quality, "vec_id",
          "embedding", SemThreshold, bands = NdBands, rowsPerBand = NdRowsPerBand,
          dim = 64)
        .select(col("id").as("doc_id"), col("quality"), col("cluster_id"),
          col("is_dropped"))
        .orderBy("doc_id")
    },
    Some {
      val planes = Similarity.hyperplanes(NdBands * NdRowsPerBand, 64)
      val bandArms = (0 until NdBands).map { b =>
        val slice = planes.slice(b * NdRowsPerBand, (b + 1) * NdRowsPerBand)
        s"SELECT vec_id AS id, $b AS band, ${bucketSql(slice)} AS bucket FROM v"
      }.mkString(" UNION ALL ")
      s"""WITH RECURSIVE v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          bk AS ($bandArms),
          ch AS (SELECT id AS id_r,
                        lag(id) OVER (PARTITION BY band, bucket ORDER BY id) AS id_l
                 FROM bk),
          cand AS (SELECT DISTINCT id_l, id_r FROM ch WHERE id_l IS NOT NULL),
          e AS (SELECT id_l, id_r
                FROM (SELECT id_l, id_r, ${cosSql("va.ve", "vb.ve")} AS cosine
                      FROM cand
                      JOIN v va ON va.vec_id = id_l
                      JOIN v vb ON vb.vec_id = id_r)
                WHERE cosine >= $SemThreshold),
          eb AS (SELECT id_l AS src, id_r AS dst FROM e
                 UNION ALL SELECT id_r, id_l FROM e),
          nodes AS (SELECT DISTINCT src AS id FROM eb),
          reach(root, node) AS (
            SELECT id, id FROM nodes
            UNION
            SELECT r.root, eb.dst FROM reach r JOIN eb ON r.node = eb.src),
          comp AS (SELECT root AS id, min(node) AS component
                   FROM reach GROUP BY root),
          q AS (SELECT doc_id AS id,
                       least(CAST(length(text) AS DOUBLE) / 400.0, 1.0) * 0.5 +
                         (CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
                          / len(string_split_regex(lower(text), '\\s+'))) * 0.5 AS quality
                FROM documents),
          wc AS (SELECT q.id, q.quality, coalesce(comp.component, q.id) AS cluster_id
                 FROM q LEFT JOIN comp ON q.id = comp.id),
          keep AS (SELECT cluster_id, id AS keep_id
                   FROM (SELECT cluster_id, id, row_number() OVER (
                           PARTITION BY cluster_id
                           ORDER BY quality DESC, id ASC) AS rn
                         FROM wc)
                   WHERE rn = 1)
          SELECT wc.id AS doc_id, wc.quality, wc.cluster_id,
                 wc.id <> keep.keep_id AS is_dropped
          FROM wc JOIN keep USING (cluster_id)
          ORDER BY doc_id"""
    })

  /** Hyperplane-LSH bucketed ANN (8 planes → 256 buckets): the 100 TB path —
    * bucket equi-join instead of cross product. The oracle mirrors the
    * bucket assignment + in-bucket ranking in SQL (plane literals again),
    * so queries whose bucket holds fewer than k neighbors are checked
    * exactly too; recall vs q28's brute force is unit-tested separately
    * (SimilaritySpec). */
  private val q30 = QDef(
    "q30_ann_lsh",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, numPlanes = 8, dim = 64)
        .orderBy("query_id", "rank")
    },
    Some {
      val planes = Similarity.hyperplanes(8, 64)
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          b AS (SELECT vec_id, ve, ${bucketSql(planes)} AS bucket FROM v),
          q AS (SELECT vec_id AS query_id, ve AS qv, bucket FROM b WHERE vec_id < 8),
          c AS (SELECT vec_id AS neighbor_id, ve AS nv, bucket FROM b),
          sc AS (SELECT query_id, neighbor_id, ${cosSql("qv", "nv")} AS cosine
                 FROM c JOIN q USING (bucket)
                 WHERE query_id <> neighbor_id),
          r AS (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
          FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    })

  /** Multi-probe hyperplane-LSH ANN — q30's bucketed search plus the
    * standard recall knob: each query additionally probes every bucket at
    * Hamming distance 1 (flip one of the 8 plane bits), at 9× query-side
    * fan-out and unchanged corpus-side cost. The oracle mirrors the probing
    * arms as a SQL union over xor'd bucket ids (plane literals again), so
    * the whole multi-probe pipeline is value-hash checked; the recall
    * improvement over single-probe is asserted in SimilaritySpec. */
  private val q90 = QDef(
    "q90_ann_lsh_multiprobe",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.lshTopK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, numPlanes = 8, dim = 64, multiProbe = true)
        .orderBy("query_id", "rank")
    },
    Some {
      val planes = Similarity.hyperplanes(8, 64)
      val probeArms = ("SELECT query_id, qv, bucket FROM q" +:
        (0 until 8).map(i =>
          s"SELECT query_id, qv, xor(bucket, ${1L << i}) AS bucket FROM q"))
        .mkString(" UNION ALL ")
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          b AS (SELECT vec_id, ve, ${bucketSql(planes)} AS bucket FROM v),
          q AS (SELECT vec_id AS query_id, ve AS qv, bucket FROM b WHERE vec_id < 8),
          probes AS ($probeArms),
          c AS (SELECT vec_id AS neighbor_id, ve AS nv, bucket FROM b),
          hit AS (SELECT DISTINCT query_id, neighbor_id
                  FROM c JOIN probes USING (bucket)
                  WHERE query_id <> neighbor_id),
          sc AS (SELECT query_id, neighbor_id, ${cosSql("vq.ve", "vn.ve")} AS cosine
                 FROM hit
                 JOIN v vq ON vq.vec_id = query_id
                 JOIN v vn ON vn.vec_id = neighbor_id),
          r AS (SELECT *, row_number() OVER (
                  PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                FROM sc)
          SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
          FROM r WHERE rank <= 5 ORDER BY query_id, rank"""
    })

  /** IVF-style ANN (training-free inverted lists, probe the 4 nearest of
    * ~n/20 lists): the second scale path beside hyperplane LSH. Nothing here
    * is hash-dependent — centroid choice, nearest-centroid assignment, probe
    * selection and in-list ranking are all plain arithmetic — so the oracle
    * mirrors the complete selective-probe pipeline in SQL; the probe-all ==
    * brute-force degenerate case is additionally unit-tested (ScaleSpec). */
  private val q40 = QDef(
    "q40_ann_ivf",
    (s, dir) => {
      val e = embeddings(s, dir)
      graft.ext.Ivf.topK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, stride = 20, nProbe = 4)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
             cent AS (SELECT vec_id AS list_id, ve AS cv FROM v WHERE vec_id % 20 = 0),
             asg AS (SELECT vec_id, ve, list_id FROM (
                       SELECT v.vec_id, v.ve, cent.list_id,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY ${cosSql("v.ve", "cent.cv")} DESC, cent.list_id) AS rn
                       FROM v CROSS JOIN cent) WHERE rn = 1),
             q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < 8),
             probes AS (SELECT query_id, qv, list_id FROM (
                          SELECT q.query_id, q.qv, cent.list_id,
                                 row_number() OVER (PARTITION BY q.query_id
                                   ORDER BY ${cosSql("q.qv", "cent.cv")} DESC, cent.list_id) AS rn
                          FROM q CROSS JOIN cent) WHERE rn <= 4),
             sc AS (SELECT query_id, vec_id AS neighbor_id,
                           ${cosSql("qv", "ve")} AS cosine
                    FROM probes JOIN asg USING (list_id)
                    WHERE query_id <> vec_id),
             r AS (SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                   FROM sc)
             SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
             FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** q159: the Lloyd UPDATE step of k-means over the embedding column —
    * the oracle-checked complement of q40's nearest-centroid ASSIGNMENT
    * (together they pin both halves of [[graft.ext.Ivf.trainCentroids]]'s
    * iteration; the multi-iteration loop itself is spec'd in ScaleSpec,
    * where cross-engine double parity can't gate it). Cluster profile per
    * stride-initialized centroid: member count (exact, hash-gated) and the
    * mean-updated first two centroid components (order-dependent double
    * aggregates — rounded to 6 decimals on both engines per the q43/q71
    * convention). Scale shape: broadcast(k centroids) assignment scored
    * scalar per row — the corpus is never pairwise-joined — then one keyed
    * aggregate; the k-row profile is the only shuffled output. */
  private val q159 = QDef(
    "q159_kmeans_profile",
    (s, dir) => {
      val e = embeddings(s, dir)
      val cents = e.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("list_id"), col("embedding").as("cv"))
      graft.ext.Ivf.assignTo(e, cents, "vec_id", "embedding")
        .select(col("list_id"),
          col("embedding").getItem(0).as("__c0"),
          col("embedding").getItem(1).as("__c1"))
        .groupBy("list_id")
        .agg(count(lit(1)).as("n_members"),
          round(avg(col("__c0")), 6).as("mean_c0"),
          round(avg(col("__c1")), 6).as("mean_c1"))
        .orderBy("list_id")
    },
    Some(s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
             cent AS (SELECT vec_id AS list_id, ve AS cv FROM v WHERE vec_id % 20 = 0),
             asg AS (SELECT vec_id, ve, list_id FROM (
                       SELECT v.vec_id, v.ve, cent.list_id,
                              row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY ${cosSql("v.ve", "cent.cv")} DESC, cent.list_id) AS rn
                       FROM v CROSS JOIN cent) WHERE rn = 1)
             SELECT list_id, CAST(count(*) AS BIGINT) AS n_members,
                    round(avg(ve[1]), 6) AS mean_c0,
                    round(avg(ve[2]), 6) AS mean_c1
             FROM asg GROUP BY list_id ORDER BY list_id"""))

  // ---------- text analysis ----------

  private val stopSql = Map(
    "en" -> "'the','a','of','and','to','in','is'",
    "es" -> "'el','la','de','y','que','en'",
    "fr" -> "'le','la','de','et','les','des'",
    "de" -> "'der','die','das','und','ist','von'")

  /** Stopword-vote language ID, reported as a confusion matrix against the
    * table's labeled lang. */
  private val q31 = QDef(
    "q31_lang_id",
    (s, dir) => Tables.load(s, dir, "documents")
      .withColumn("predicted", TextAnalysis.langId(col("text")))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted"),
    Some(s"""WITH t AS (
               SELECT lang, string_split_regex(lower(text), '\\s+') AS w FROM documents),
             sc AS (
               SELECT lang,
                      len(list_filter(w, x -> x IN (${stopSql("en")}))) AS en,
                      len(list_filter(w, x -> x IN (${stopSql("es")}))) AS es,
                      len(list_filter(w, x -> x IN (${stopSql("fr")}))) AS fr,
                      len(list_filter(w, x -> x IN (${stopSql("de")}))) AS de
               FROM t),
             p AS (
               SELECT lang,
                      CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                           WHEN en = greatest(en, es, fr, de) THEN 'en'
                           WHEN es = greatest(en, es, fr, de) THEN 'es'
                           WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                           ELSE 'de' END AS predicted
               FROM sc)
             SELECT lang, predicted, CAST(count(*) AS BIGINT) AS n
             FROM p GROUP BY lang, predicted ORDER BY lang, predicted"""))

  /** Per-document quality metrics: scalar expressions only — bit-identical
    * on both engines, so no rounding anywhere. */
  private val q32 = QDef(
    "q32_text_quality",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        TextAnalysis.wordCount(col("text")).as("n_words"),
        TextAnalysis.distinctWordRatio(col("text")).as("distinct_ratio"),
        TextAnalysis.meanWordLength(col("text")).as("mean_word_len"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id"),
    Some("""WITH t AS (
              SELECT doc_id, text, length(text) AS n_chars,
                     string_split_regex(lower(text), '\s+') AS w
              FROM documents)
            SELECT doc_id,
                   CAST(n_chars AS BIGINT) AS n_chars,
                   CAST(len(w) AS BIGINT) AS n_words,
                   CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
                   CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS mean_word_len,
                   least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) * 0.5 +
                     (CAST(len(list_distinct(w)) AS DOUBLE) / len(w)) * 0.5 AS quality
            FROM t ORDER BY doc_id"""))

  /** Token counting: whitespace tokens, BPE-ish lexer tokens, distinct. */
  private val q33 = QDef(
    "q33_token_count",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(
        col("doc_id"),
        TextAnalysis.wordCount(col("text")).as("ws_tokens"),
        TextAnalysis.regexTokenCount(col("text")).as("lexer_tokens"),
        size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long").as("distinct_tokens"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS lexer_tokens,
                   CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS distinct_tokens
            FROM documents ORDER BY doc_id"""))

  /** Rolling-hash document fingerprint (mod 1e9+7 left fold over word
    * codes) — integer-exact on both engines. */
  private val q34 = QDef(
    "q34_fingerprint",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   list_reduce(
                     list_prepend(0::BIGINT,
                       list_transform(string_split_regex(lower(text), '\s+'),
                                      w -> (ascii(w) * 7 + length(w))::BIGINT)),
                     (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
            FROM documents ORDER BY doc_id"""))

  // ---------- multimodal ----------

  /** Binary media plumbing with the SQL-expressible stub codec: ingest text
    * bytes as media, "decode" metadata, "classify", aggregate. The typed
    * mapPartitions decode path is unit-tested (MultimodalSpec). */
  private val q35 = QDef(
    "q35_multimodal_stub",
    (s, dir) => {
      val m = Multimodal.withMedia(Tables.load(s, dir, "documents"), "text")
        .withColumn("meta", Multimodal.decodeStubSql(col("media")))
      m.withColumn("label", Multimodal.classifyStubSql(col("meta")))
        .groupBy(col("meta.format").as("format"), col("label"))
        .agg(count(lit(1)).as("n"), sum(col("meta.width")).cast("long").as("total_width"))
        .orderBy("format", "label")
    },
    Some("""WITH m AS (
              SELECT octet_length(encode(text)) AS len FROM documents),
            d AS (
              SELECT len % 640 + 1 AS width,
                     CASE len % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
              FROM m)
            SELECT format,
                   CASE WHEN width % 2 = 0 THEN 'house' ELSE 'envelope' END AS label,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(width) AS BIGINT) AS total_width
            FROM d GROUP BY 1, 2 ORDER BY format, label"""))

  /** DuckDB mirror of the streaming incremental near-dup fold
    * ([[graft.streaming.IncrementalNearDupSink]] in MirrorMode): the
    * 3-batch online algorithm UNROLLED — per batch, store-vs-batch bucket
    * collisions plus batch-internal chain candidates, exact-Jaccard
    * verification, min-id connected components (a recursive reachability
    * CTE per batch), cluster resolution against the kept set, and the
    * keeper-store append. Every keeper/dup_of value is recomputed, so the
    * row's hash encodes the sink's full online assignment. */
  private def neardupMirrorSql: String = {
    def block(k: Int): String = {
      val prev = s"keep${k - 1}"
      s"""cand$k AS MATERIALIZED (
              SELECT DISTINCT id_l, id_r FROM (
                SELECT kb.doc_id AS id_l, nb.doc_id AS id_r
                FROM bk kb JOIN bk nb
                  ON nb.band = kb.band AND nb.bucket = kb.bucket
                WHERE kb.doc_id IN (SELECT id FROM $prev)
                  AND nb.doc_id IN (SELECT doc_id FROM bat$k)
                UNION ALL
                SELECT id_l, id_r FROM (
                  SELECT lag(doc_id) OVER (PARTITION BY band, bucket
                                           ORDER BY doc_id) AS id_l,
                         doc_id AS id_r
                  FROM bk WHERE doc_id IN (SELECT doc_id FROM bat$k)) t
                WHERE id_l IS NOT NULL) u),
            edges$k AS MATERIALIZED (
              SELECT j.id_l AS a, j.id_r AS b
              FROM (SELECT c.id_l, c.id_r, count(*) AS common
                    FROM cand$k c
                    JOIN sh x ON x.doc_id = c.id_l
                    JOIN sh y ON y.doc_id = c.id_r AND y.sh = x.sh
                    GROUP BY 1, 2) j
              JOIN sizes sa ON sa.doc_id = j.id_l
              JOIN sizes sb ON sb.doc_id = j.id_r
              WHERE CAST(j.common AS DOUBLE) / (sa.sz + sb.sz - j.common) >= 0.5),
            sym$k(a, b) AS MATERIALIZED (
              SELECT a, b FROM edges$k UNION SELECT b, a FROM edges$k),
            reach$k(id, r) AS (
              SELECT a, a FROM sym$k
              UNION
              SELECT s.b, reach$k.r FROM sym$k s JOIN reach$k ON reach$k.id = s.a),
            comp$k AS MATERIALIZED (SELECT id, min(r) AS comp FROM reach$k GROUP BY id),
            kc$k AS MATERIALIZED (SELECT comp, min(id) AS kc FROM comp$k
                     WHERE id IN (SELECT id FROM $prev) GROUP BY comp),
            cm$k AS MATERIALIZED (SELECT comp, min(id) AS cm FROM comp$k
                     WHERE id IN (SELECT doc_id FROM bat$k) GROUP BY comp),
            verdict$k AS MATERIALIZED (
              SELECT d.doc_id AS id,
                     CASE WHEN r.canon IS NOT NULL AND r.canon <> d.doc_id
                          THEN r.canon END AS dup_of
              FROM bat$k d
              LEFT JOIN (
                SELECT c.id, coalesce(kk.kc, m.cm) AS canon
                FROM comp$k c
                JOIN cm$k m ON m.comp = c.comp
                LEFT JOIN kc$k kk ON kk.comp = c.comp
                WHERE c.id IN (SELECT doc_id FROM bat$k)) r ON r.id = d.doc_id),
            keep$k AS MATERIALIZED (SELECT id FROM $prev UNION ALL
                       SELECT id FROM verdict$k WHERE dup_of IS NULL)"""
    }
    s"""WITH RECURSIVE ${mirrorMinhashCtes("documents", 16, 4)},
            sizes AS MATERIALIZED (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            cuts AS (SELECT max(doc_id) // 3 AS c1,
                            (2 * max(doc_id)) // 3 AS c2 FROM documents),
            bat1 AS MATERIALIZED (SELECT doc_id FROM documents, cuts WHERE doc_id <= c1),
            bat2 AS MATERIALIZED (SELECT doc_id FROM documents, cuts
                     WHERE doc_id > c1 AND doc_id <= c2),
            bat3 AS MATERIALIZED (SELECT doc_id FROM documents, cuts WHERE doc_id > c2),
            keep0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id WHERE 1 = 0),
            ${block(1)},
            ${block(2)},
            ${block(3)}
            SELECT id, dup_of FROM (
              SELECT * FROM verdict1
              UNION ALL SELECT * FROM verdict2
              UNION ALL SELECT * FROM verdict3)
            ORDER BY id"""
  }

  /** q181: the streaming incremental near-dup sink
    * ([[graft.streaming.IncrementalNearDupSink]]) driven through a REAL
    * file-source stream under a FULL VALUE MIRROR. Documents are staged as
    * three id-range batch files with strictly ascending mtimes (the file
    * source orders discovery by timestamp), streamed one file per
    * micro-batch into the sink via `foreachBatch` in
    * [[TextDedup.MirrorMode]], and the terminal `(id, dup_of)` verdicts
    * are compared value-for-value against [[neardupMirrorSql]] — DuckDB
    * re-runs the whole online fold (bucket collisions against the kept
    * store, chain candidates, exact verification, per-batch connected
    * components, first-seen-wins keeper resolution), so ANY divergence in
    * any batch's assignment hash-fails. (Rounds ≤10 pinned invariant-style
    * zeros here because XxMode bucket ids weren't ANSI-reproducible; the
    * invariants live on in IncrementalNearDupSpec and q94's batch family.) */
  private val q181 = QDef(
    "q181_stream_neardup_sink",
    (s, dir) => StreamSession(s) { ss =>
      val docs = Tables.load(ss, dir, "documents").select(col("doc_id"), col("text"))
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q181_").toString)
      val mx = docs.agg(max(col("doc_id"))).head().getLong(0)
      val cuts = Seq(mx / 3, 2 * mx / 3)
      // pinMtime: first-seen-wins is order-SENSITIVE, so discovery order
      // (the source sorts by mtime) must match the id ranges
      val inDir = Staging.stageBatches(
        Seq(docs.where(col("doc_id") <= cuts(0)),
          docs.where(col("doc_id") > cuts(0) && col("doc_id") <= cuts(1)),
          docs.where(col("doc_id") > cuts(1))),
        tmp, pinMtime = true)
      val sink = new graft.streaming.IncrementalNearDupSink("doc_id", "text",
        n = ShingleN, numPerm = 16, bands = 4, threshold = 0.5,
        mode = TextDedup.MirrorMode)
      val q = ss.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => sink.update(b, id))
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val v = sink.verdicts.getOrElse(sys.error("stream produced no batches"))
      v.select(col("id"), col("dup_of")).orderBy("id")
    },
    Some(neardupMirrorSql))

  /** q182: the stream-stream LEFT OUTER attribution join
    * ([[Streams.attributionJoin]] — the one stream-stream shape still
    * spec-only after q175's inner fan-in) through the REAL micro-batch
    * engine under q84's oracle verbatim. The subtle semantics under test:
    * a streaming outer join may null-extend an unmatched purchase ONLY
    * once the global watermark (the MIN across both inputs) proves no
    * matching click can still arrive. Left to itself, a terminating
    * stream would hold back every purchase inside the final watermark
    * horizon — so each side's staged batches end with a far-future
    * SENTINEL row (mtime-pinned to arrive last): the terminal watermark
    * passes every real row, the engine must flush every real unmatched
    * purchase in the watermark-advance batch AvailableNow runs after the
    * data is drained, and the terminal table becomes exactly the batch
    * twin — hash-checked. Sentinels are keyed user_id = -1 (purchase
    * side) and -2 (click side) — DIFFERENT keys, so they cannot match
    * each other: the sentinel purchase is genuinely unmatched and is
    * null-extended once the terminal watermark passes it (or held back
    * if its window end exceeds that watermark — either way it never
    * joins), and the negative-id filter drops it from the read-back. */
  private val q182 = QDef(
    "q182_stream_attribution",
    (s, dir) => StreamSession(s) { ss =>
      val ev = Tables.load(ss, dir, "events")
      def side(tpe: String) = ev.where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as("txn_id"), col("ts"))
      def sentinel(uid: Long) = ss.range(1).select(lit(uid).as("user_id"),
        lit(-1L).as("txn_id"),
        to_timestamp(lit("2099-01-01 00:00:00")).as("ts"))
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q182_").toString)
      def stage(tpe: String, sub: String, sentinelUid: Long): String = {
        val d = side(tpe)
        Staging.stageBatches(
          Seq(d.where(pmod(col("user_id"), lit(2)) === 0),
            d.where(pmod(col("user_id"), lit(2)) === 1),
            sentinel(sentinelUid)),
          s"$tmp/$sub", pinMtime = true)
      }
      val schema = sentinel(-1L).schema
      def readSide(inDir: String) = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val joined = Streams.attributionJoin(
        readSide(stage("purchase", "p", -1L)),
        readSide(stage("click", "c", -2L)),
        within = "30 minutes", watermark = "1 hour", streaming = true)
      val sink = "q182_stream_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink)
        .where(col("user_id") >= 0L) // drop both sentinel keys (-1, -2)
        .groupBy(col("user_id"), col("purchase_id"))
        .agg(count(col("click_id")).as("n_clicks"),
          coalesce(max(col("click_id")), lit(-1L)).as("last_click_id"))
        .orderBy("user_id", "purchase_id")
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pms
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS cms
                       FROM events WHERE event_type = 'click')
            SELECT p.user_id, p.purchase_id,
                   CAST(count(c.click_id) AS BIGINT) AS n_clicks,
                   coalesce(max(c.click_id), -1) AS last_click_id
            FROM p LEFT JOIN c
              ON p.user_id = c.user_id
             AND c.cms >= p.pms - 1800000 AND c.cms <= p.pms
            GROUP BY p.user_id, p.purchase_id
            ORDER BY p.user_id, p.purchase_id"""))

  /** q183: the Misra–Gries sketch as STREAMING AGGREGATION STATE —
    * [[Streams.heavyHittersStream]] through the real micro-batch engine:
    * the `approx_top_k` TypedImperativeAggregate's buffer lives in the
    * state store per window and is MERGED across micro-batches (events
    * staged as three files, one per trigger), so this row certifies the
    * sketch's mergeability under the engine's partial/merge protocol, not
    * just within one job (q73 covers the batch path). Oracle = q73's
    * containment guarantee, per window: with k=2 counters, every item
    * with cnt·(k+1) > n in its window is PROVABLY retained by a correct
    * MG sketch regardless of merge order — the registered result is that
    * exact guaranteed set (computed in batch) semi-joined against the
    * streamed sketch output, so a merge that dropped a guaranteed item
    * shrinks the result and hash-fails. 327 of 720 hourly windows at
    * sf0.01 carry a guaranteed item (per-window majority by chance), so
    * the gate is far from vacuous. */
  private val q183 = QDef(
    "q183_stream_heavy_hitters",
    (s, dir) => StreamSession(s) { ss =>
      val k = 2
      val ev0 = Tables.load(ss, dir, "events")
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q183_").toString)
      val inDir = Staging.stageBatches(
        (0 until 3).map(i => ev0.where(pmod(col("event_id"), lit(3)) === i)), tmp)
      val sink = "q183_stream_sink"
      val q = Streams.heavyHittersStream(
          ss.readStream.schema(ev0.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir),
          k, watermark = Some("2 hours"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val exact = ev0
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_millis(col("w.start")).as("start_ms"),
          col("event_type").as("item"), col("cnt"))
      val tot = exact.groupBy("start_ms").agg(sum(col("cnt")).as("__n"))
      exact.join(tot, "start_ms")
        .where(col("cnt") * (k + 1) > col("__n"))
        .join(ss.table(sink).select("start_ms", "item"),
          Seq("start_ms", "item"), "left_semi")
        .select(col("start_ms"), col("item"), col("cnt"))
        .orderBy("start_ms", "item")
    },
    Some("""WITH w AS (SELECT epoch_ms(date_trunc('hour', ts)) AS start_ms,
                              event_type AS item,
                              CAST(count(*) AS BIGINT) AS cnt
                       FROM events GROUP BY 1, 2),
                 t AS (SELECT start_ms, sum(cnt) AS n FROM w GROUP BY 1)
            SELECT w.start_ms, w.item, w.cnt
            FROM w JOIN t USING (start_ms)
            WHERE w.cnt * 3 > t.n
            ORDER BY start_ms, item"""))

  /** q179: the multimodal column with a REAL codec —
    * [[Multimodal.HeaderCodec]] parses container dimensions and frame
    * counts straight from PNG IHDR / JPEG SOFn / GIF logical-screen +
    * block-walk byte layouts (public formats, zero libraries). Fixtures
    * are genuinely ENCODED images: each nation row renders a real
    * PNG/JPEG/GIF (multi-frame GIF every 6th row) through the JDK's
    * javax.imageio inside the same `mapPartitions` pass that production
    * would use to fetch blobs — so the decode path runs against real
    * container bytes, distributed, and the oracle can recompute every
    * field from the row key because the RENDER parameters (not the codec
    * output) are key-derived. A wrong parser (bad endianness, unskipped
    * color table, missed SOF) hash-fails. StubCodec remains the q35 path
    * for formats with no parseable container. */
  private val q179 = QDef(
    "q179_media_header_decode",
    (s, dir) => {
      import s.implicits._
      val withBytes = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").cast("long").as("id")).as[Long]
        .mapPartitions(_.map { id =>
          val w = 8 + (id % 11).toInt
          val h = 9 + (id % 6).toInt
          val fmt = (id % 3) match {
            case 0 => "png"; case 1 => "jpeg"; case _ => "gif"
          }
          val frames = if (fmt == "gif" && id % 6 == 2) 3 else 1
          (id, Multimodal.renderImage(w, h, fmt, frames, seed = id))
        })
        .toDF("id", "media")
      // resize + frame sampling run over the REAL decoded metadata (the
      // q35 stub path exercises the same operators over fake metadata);
      // the oracle mirrors the double scale arithmetic op-for-op and
      // truncates like Spark's double->int cast
      val resized = Multimodal.resizeMeta(col("meta"), 16)
      Multimodal.decodeAll(withBytes, "id", Multimodal.HeaderCodec)
        .select(col("id"), col("meta.width").as("width"),
          col("meta.height").as("height"), col("meta.format").as("format"),
          col("meta.frames").as("frames"),
          resized.getField("width").as("resized_w"),
          resized.getField("height").as("resized_h"),
          size(Multimodal.sampleFrames(col("meta"), 2)).as("n_sampled_frames"),
          col("label"))
        .orderBy("id")
    },
    Some("""WITH m AS (
              SELECT CAST(n_nationkey AS BIGINT) AS id,
                     CAST(8 + n_nationkey % 11 AS INTEGER) AS width,
                     CAST(9 + n_nationkey % 6 AS INTEGER) AS height,
                     CASE CAST(n_nationkey % 3 AS INTEGER)
                       WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'gif'
                     END AS format,
                     CAST(CASE WHEN n_nationkey % 6 = 2 THEN 3 ELSE 1 END
                          AS INTEGER) AS frames
              FROM nation)
            SELECT id, width, height, format, frames,
                   CAST(CASE WHEN width > 16
                     THEN trunc(width * (CAST(16 AS DOUBLE) / width))
                     ELSE width END AS INTEGER) AS resized_w,
                   CAST(CASE WHEN width > 16
                     THEN trunc(height * (CAST(16 AS DOUBLE) / width))
                     ELSE height END AS INTEGER) AS resized_h,
                   CAST((frames + 1) // 2 AS INTEGER) AS n_sampled_frames,
                   CASE WHEN width >= height
                     THEN 'landscape' ELSE 'portrait' END AS label
            FROM m ORDER BY id"""))

  // ---------- events: windowed aggregation, sessionization, JSON ----------

  /** Tumbling 1-hour window aggregation (the batch twin of the streaming
    * plan — same builder, watermark added on streams). */
  private val q36 = QDef(
    "q36_window_agg",
    (s, dir) => Streams
      .windowedAgg(Tables.load(s, dir, "events"), watermark = None)
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("window_start_ms", "event_type"),
    Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type"""))

  /** q168: the q36 windowed aggregation executed through the ACTUAL
    * Structured Streaming engine — a file-source `readStream` over the
    * same events parquet, the SAME [[Streams.windowedAgg]] builder,
    * `Trigger.AvailableNow` micro-batches into a memory sink, result read
    * back once the stream terminates. Complete output mode so the final
    * table equals the batch twin's (append mode would hold back windows
    * the terminal watermark never passed — a row-count mismatch by
    * design, not a bug). Oracle = q36's SQL verbatim: this row proves the
    * STREAMING execution path (micro-batch planner, stateful agg,
    * memory-sink commit) computes the batch answer, under the driver
    * contract rather than only in StreamsSpec. */
  private val q168 = QDef(
    "q168_stream_window_agg",
    (s, dir) => StreamSession(s) { ss =>
      val path = s"$dir/events.parquet"
      val schema = ss.read.parquet(path).schema
      // the testdata table is a single FILE; the file stream source
      // requires a directory or a GLOB (it tails for new files), so read
      // the one file via glob — at scale the path is a directory of
      // parts and this is just `.parquet(dir)`
      val ev = Tables.normalizeEventsTs(
        ss.readStream.schema(schema).parquet(s"$path*"))
      val sink = "q168_stream_sink"
      val q = Streams.windowedAgg(ev, watermark = Some("2 hours"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink)
        .select(unix_millis(col("window_start")).as("window_start_ms"),
          col("event_type"), col("n_events"),
          round(col("total_value"), 2).as("total_value"))
        .orderBy("window_start_ms", "event_type")
    },
    Some("""SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   round(sum(value), 2) AS total_value
            FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type"""))

  /** The q171/q184 pipeline (q184 = same query on the RocksDB state-store
    * provider): gap sessionization through the ACTUAL Structured Streaming
    * STATE-STORE path — q168 proves the stateless micro-batch engine; these
    * rows prove the stateful one (`flatMapGroupsWithState` +
    * EventTimeTimeout state in the state store, the path a user runs
    * sessionization on as a stream). File-source `readStream` over the
    * same events parquet → [[Streams.sessionizeStream]] →
    * `Trigger.AvailableNow` → memory sink, Append mode.
    *
    * Append-mode streaming semantics, mirrored EXACTLY by the shared
    * oracle: a session is emitted either when a later event from the same
    * user closes it (every session except each user's last), or when the
    * terminal watermark passes its timeout — Spark times out state when
    * `timeoutTimestamp < watermark` (strict), with watermark =
    * floor-to-ms(max event time) at delay 0, so a user's LAST session is
    * emitted iff `end_ms + gap < max_ms` over the whole table. A
    * complete-mode wash would hide exactly the state-eviction semantics
    * these rows exist to pin down. */
  private def sessionizeContract(ss: SparkSession, dir: String,
      sink: String, tws: Boolean = false): DataFrame = {
    import ss.implicits._
    val path = s"$dir/events.parquet"
    val schema = ss.read.parquet(path).schema
    // single-FILE testdata table read via glob (file stream source wants
    // a directory/glob); at scale this is just `.parquet(dir)`
    val ev = Tables.normalizeEventsTs(
      ss.readStream.schema(schema).parquet(s"$path*"))
    val evTyped = ev.select(col("user_id"), col("ts")).as[Streams.SessionEvent]
    val sessions =
      if (tws) Streams.sessionizeStreamTws(evTyped,
        gapMs = 30 * 60 * 1000L, watermarkDelay = "0 seconds")
      else Streams.sessionizeStream(evTyped,
        gapMs = 30 * 60 * 1000L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(sink).orderBy("user_id", "start_ms")
  }

  private val q171 = QDef(
    "q171_stream_sessionize",
    (s, dir) => StreamSession(s) { ss => sessionizeContract(ss, dir, "q171_stream_sink") },
    // q37's session CTEs + the append-mode emission rule (strict <, ms
    // floor on both engines: Timestamp.getTime / epoch_ms)
    Some("""WITH x AS (
              SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
                     lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            y AS (
              SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS brk
              FROM x),
            z AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM y),
            sess AS (
              SELECT user_id, sid, min(ms) AS start_ms, max(ms) AS end_ms,
                     CAST(count(*) AS BIGINT) AS n_events,
                     max(sid) OVER (PARTITION BY user_id) AS max_sid
              FROM z GROUP BY user_id, sid)
            SELECT user_id, start_ms, end_ms, n_events
            FROM sess
            WHERE sid < max_sid
               OR end_ms + 1800000 < (SELECT max(epoch_ms(ts)) FROM events)
            ORDER BY user_id, start_ms"""))

  /** q184: q171's stateful sessionization on the ROCKSDB state-store
    * provider under the same oracle — COVERAGE has claimed "the at-scale
    * store is a conf flip" on spec evidence (StreamsSpec RocksDB parity);
    * this row makes it a hash-checked contract fact. The provider conf is
    * session-scoped (set on the per-run stream session), so nothing leaks
    * to concurrently-planned batch queries. At 100 TB state volumes the
    * HDFS-backed store holds every state row on-heap per partition; the
    * RocksDB provider spills to native storage with bounded memory — the
    * provider a real deployment runs, now certified byte-identical on
    * output. */
  private val q184 = QDef(
    "q184_stream_sessionize_rocksdb",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      sessionizeContract(ss, dir, "q184_stream_sink")
    },
    q171.oracle)

  /** q185: a RESTART BOUNDARY through the BUILT-IN state store under the
    * contract — q178 certifies recovery for the custom foreachBatch sink;
    * this row certifies Spark's own streaming-aggregate state path: the
    * windowed aggregation (q168's plan, complete mode) processes two
    * staged event batches, terminates cleanly, a third batch lands, and a
    * NEW query over the SAME checkpoint resumes. The terminal complete-
    * mode table equals the batch aggregate ONLY if the offset log resumes
    * from the unseen file AND the state store restores every window's
    * partial counts — state loss would undercount every pre-restart
    * window, a replay would double-count them; either hash-fails. The
    * sink is `foreachBatch` holding the latest complete table (the memory
    * sink rejects restart-from-checkpoint by design — it is not
    * fault-tolerant; foreachBatch is the documented recovery-compatible
    * sink). */
  private val q185 = QDef(
    "q185_stream_agg_restart",
    (s, dir) => StreamSession(s)(ss => aggRestartContract(ss, dir, "q185_")),
    q168.oracle)

  /** q185's restart choreography as a reusable contract body (q193 reruns
    * it on the RocksDB provider): two staged batches → clean termination →
    * third batch → a NEW query over the SAME checkpoint resumes through
    * Spark's own streaming-aggregate state. */
  private def aggRestartContract(ss: SparkSession, dir: String,
      tmpPrefix: String): DataFrame = {
    val ev0 = Tables.load(ss, dir, "events")
    val tmp = TmpReaper.register(
      java.nio.file.Files.createTempDirectory(tmpPrefix).toString)
    val last = new java.util.concurrent.atomic.AtomicReference[DataFrame]()
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    def lifecycle(inDir: String): Unit = {
      val q = Streams.windowedAgg(
          ss.readStream.schema(ev0.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir),
          watermark = Some("2 hours"))
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => {
          last.set(b.localCheckpoint()); nBatches.incrementAndGet(); ()
        })
        .outputMode("complete")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val inDir = Staging.stageBatches(
      (0 to 1).map(i => ev0.where(pmod(col("event_id"), lit(3)) === i)), tmp)
    lifecycle(inDir)
    val afterL1 = nBatches.get()
    require(afterL1 > 0, "lifecycle 1 produced no micro-batches")
    Staging.stageBatches(
      Seq(ev0.where(pmod(col("event_id"), lit(3)) === 2)), tmp, startIndex = 2)
    lifecycle(inDir)
    require(nBatches.get() > afterL1,
      "restarted lifecycle processed no micro-batches (staged batch not picked up)")
    last.get()
      .select(unix_millis(col("window_start")).as("window_start_ms"),
        col("event_type"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("window_start_ms", "event_type")
  }

  /** q193: q185's restart boundary COMPOSED with the RocksDB state store
    * provider — q184 certifies RocksDB single-lifecycle, q185 certifies
    * restart on the default HDFS-backed provider; a real deployment runs
    * BOTH at once, and recovery is exactly where a provider's
    * checkpoint/restore format differences bite (RocksDB restores from
    * its own SST snapshot + changelog, not the HDFSBackedStateStore delta
    * files). State loss undercounts pre-restart windows, replay
    * double-counts; either hash-fails against q168's batch oracle. */
  private val q193 = QDef(
    "q193_stream_agg_restart_rocksdb",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      aggRestartContract(ss, dir, "q193_")
    },
    q168.oracle)

  /** q191: the watermark's LATE-DATA DROP semantics under the contract —
    * every other streaming row uses delay-0 watermarks or sentinel
    * flushes where all rows are on time; this row stages the NEWEST
    * events first (advancing the watermark to max(ts) − 18 days ≈
    * Jan 12), an on-time middle batch, then the OLD half TWO batches
    * behind the advance, so rows genuinely arrive behind the watermark
    * and the engine must EXCLUDE exactly those whose 1-hour
    * window can no longer change (window end ≤ watermark — the filter
    * Spark applies to late input is the state-eviction predicate). The
    * oracle mirrors that rule arithmetically: keep a row iff it is from
    * the on-time half OR its window end exceeds max(ts) − 18d, so a
    * stream that dropped too much, too little, or at the wrong boundary
    * hash-fails. The `require` makes the gate non-vacuous: at least one
    * row must actually be dropped (numRowsDroppedByWatermark > 0). A
    * far-future sentinel flushes all real windows; its own window ends
    * beyond the terminal watermark and is held back. */
  private val q191 = QDef(
    "q191_stream_late_drop",
    (s, dir) => StreamSession(s) { ss =>
      val ev0 = Tables.load(ss, dir, "events")
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q191_").toString)
      val cutTs = to_timestamp(lit("2024-01-16 00:00:00"))
      val sentinel = ev0.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", to_timestamp(lit("2099-01-01 00:00:00")))
      // Spark (3.4+) filters late input against the PREVIOUS batch's
      // watermark (SPARK-40925: lateEvents wm lags eviction wm by one
      // batch), so lateness within one batch of the advance is forgiven —
      // the old half must land TWO batches after the rows that advanced
      // the watermark for drops to be real (measured: 0 drops without the
      // middle batch, 287 dropped state rows / 287 missing windows with it)
      val midTs = to_timestamp(lit("2024-01-23 00:00:00"))
      val inDir = Staging.stageBatches(
        Seq(ev0.where(col("ts") >= midTs), // newest: watermark jumps
          ev0.where(col("ts") >= cutTs && col("ts") < midTs), // on time
          ev0.where(col("ts") < cutTs), // old half, now genuinely late
          sentinel),
        tmp, pinMtime = true)
      val sink = "q191_stream_sink"
      val q = ss.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .withWatermark("ts", "18 days")
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(unix_millis(col("w.start")).as("start_ms"), col("n_events"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val dropped = q.recentProgress
        .map(p => p.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum
      require(dropped > 0,
        s"watermark dropped no rows (dropped=$dropped) — late-data gate vacuous")
      ss.table(sink).orderBy("start_ms")
    },
    // 18 days = 1,555,200,000 ms; window length 1 hour = 3,600,000 ms
    Some("""WITH wm AS (SELECT max(epoch_ms(ts)) - 1555200000 AS w FROM events),
            kept AS (
              SELECT epoch_ms(ts) AS ms FROM events, wm
              WHERE epoch_ms(ts) >= epoch_ms(TIMESTAMP '2024-01-16 00:00:00')
                 OR (epoch_ms(ts) // 3600000) * 3600000 + 3600000 > wm.w)
            SELECT (ms // 3600000) * 3600000 AS start_ms,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM kept GROUP BY 1 ORDER BY 1"""))

  /** q173: watermarked streaming exact dedup through the real engine —
    * the `dropDuplicates` state-store path (one state row per distinct
    * key within the watermark horizon), the third stateful operator
    * under the driver contract after q171's flatMapGroupsWithState and
    * q168's stateful agg. Append mode emits each distinct
    * (user_id, event_type, ts) the batch it first appears, so the
    * terminal output is exactly the batch DISTINCT — the oracle. Event
    * time is truncated to the hour BEFORE the dedup so the stream
    * genuinely drops rows (raw micro-timestamps are all distinct — a
    * no-op dedup would exercise the state store without testing the
    * drops); the truncated column stays a valid event-time watermark.
    * Only the dedup keys are selected: any other column's value would
    * depend on which duplicate arrived first. */
  private val q173 = QDef(
    "q173_stream_dedup",
    (s, dir) => StreamSession(s) { ss =>
      val path = s"$dir/events.parquet"
      val schema = ss.read.parquet(path).schema
      val ev = Tables.normalizeEventsTs(
          ss.readStream.schema(schema).parquet(s"$path*"))
        .withColumn("ts", date_trunc("hour", col("ts")))
      val sink = "q173_stream_sink"
      val q = Streams.dedupStream(ev, Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"),
          unix_millis(col("ts")).as("hour_ms"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink).orderBy("user_id", "event_type", "hour_ms")
    },
    Some("""SELECT DISTINCT user_id, event_type,
                   epoch_ms(date_trunc('hour', ts)) AS hour_ms
            FROM events ORDER BY user_id, event_type, hour_ms"""))

  /** q174: key-only streaming dedup through the real
    * `dropDuplicatesWithinWatermark` state path — unlike q173 (which
    * keys state on key+timestamp), ANY re-occurrence of a key inside the
    * watermark horizon is dropped; the testdata spans one horizon under
    * AvailableNow, so the emitted set is exactly the distinct keys.
    * Keyed on (user_id, event_type) so the contract output is one row
    * per user-type pair (thousands of rows at the contract SFs, one
    * state row per pair) — wide enough that a regression double-emitting
    * or dropping per-key first arrivals is visible, where an
    * event_type-only key (5 rows) would mask everything short of a
    * whole-type loss. Only the key columns are selected (the surviving
    * row per key is first-arrival-wins — nondeterministic for non-key
    * columns). */
  private val q174 = QDef(
    "q174_stream_dedup_keys",
    (s, dir) => StreamSession(s) { ss =>
      val path = s"$dir/events.parquet"
      val schema = ss.read.parquet(path).schema
      val ev = Tables.normalizeEventsTs(
        ss.readStream.schema(schema).parquet(s"$path*"))
      val sink = "q174_stream_sink"
      val q = Streams.dedupKeysWithinWatermark(ev, Seq("user_id", "event_type"))
        .select(col("user_id"), col("event_type"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink).orderBy("user_id", "event_type")
    },
    Some("""SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type"""))

  /** q175: the structuring fan-in motif as a REAL stream-stream self-join —
    * the last stateful-operator family under the driver contract
    * (stream-stream join state: both sides buffered in the state store,
    * evicted past watermark + range). File-source `readStream` over
    * orders → the q17-style txn derivation (stateless in-stream) →
    * [[Streams.fanInPairs]] (watermarked event-time-range inner
    * self-join: two senders into one beneficiary within ±24 h, combined
    * amount over the threshold) → AvailableNow → memory sink. Inner join
    * in append mode emits each pair the micro-batch both sides exist, so
    * the terminal table equals the batch twin — the oracle recomputes the
    * same pairs relationally. `total` is one double addition of two
    * parquet values — bit-identical cross-engine, no rounding. */
  private val q175 = QDef(
    "q175_stream_fanin_join",
    (s, dir) => StreamSession(s) { ss =>
      val ordPath = s"$dir/orders.parquet"
      val schema = ss.read.parquet(ordPath).schema
      val nCust = Tables.load(ss, dir, "customer")
        .agg(max(col("c_custkey"))).head().getLong(0)
      val txns = ss.readStream.schema(schema).parquet(s"$ordPath*")
        .select(
          col("o_custkey").as("sender"),
          (lit(1L) + (col("o_orderkey") * lit(7919L)) % lit(nCust))
            .as("beneficiary"),
          col("o_orderkey").as("txn_id"),
          col("o_totalprice").as("amount"),
          col("o_orderdate").cast("timestamp").as("ts"))
        .where(col("sender") =!= col("beneficiary"))
      val sink = "q175_stream_sink"
      val q = Streams.fanInPairs(txns, minTotal = 300000.0,
          within = "24 hours", watermark = "48 hours", streaming = true)
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink).orderBy("a_txn", "b_txn")
    },
    Some("""WITH t AS (
              SELECT * FROM (
                SELECT o_custkey AS sender,
                       1 + (o_orderkey * 7919) % (SELECT max(c_custkey)
                                                  FROM customer) AS beneficiary,
                       o_orderkey AS txn_id, o_totalprice AS amount,
                       CAST(o_orderdate AS TIMESTAMP) AS ts
                FROM orders) WHERE sender <> beneficiary)
            SELECT a.sender AS a_id, b.sender AS b_id,
                   a.beneficiary AS m_id,
                   a.txn_id AS a_txn, b.txn_id AS b_txn,
                   a.amount + b.amount AS total
            FROM t a JOIN t b
              ON a.beneficiary = b.beneficiary AND a.sender < b.sender
             AND b.ts >= a.ts - INTERVAL 24 HOUR
             AND b.ts <= a.ts + INTERVAL 24 HOUR
            WHERE a.amount + b.amount > 300000
            ORDER BY a_txn, b_txn"""))

  /** Gap-based sessionization (30-min gap), window-function formulation;
    * millisecond integers throughout for cross-engine exactness. */
  private val q37 = QDef(
    "q37_sessionize",
    (s, dir) => Streams
      .sessionizeBatch(Tables.load(s, dir, "events"), gapMs = 30 * 60 * 1000L)
      .orderBy("user_id", "sid"),
    Some("""WITH x AS (
              SELECT user_id, event_id, ts, epoch_ms(ts) AS ms,
                     lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            y AS (
              SELECT *, CASE WHEN prev IS NULL OR ms - prev > 1800000 THEN 1 ELSE 0 END AS brk
              FROM x),
            z AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM y)
            SELECT user_id, CAST(sid AS BIGINT) AS sid,
                   min(ms) AS start_ms, max(ms) AS end_ms,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM z GROUP BY user_id, sid ORDER BY user_id, sid"""))

  /** Native `session_window` aggregation — the OTHER Spark sessionization
    * operator (q37 builds sessions with window functions; this uses the
    * built-in gap-merging session windows that Structured Streaming can run
    * incrementally under a watermark). Semantics differences the oracle
    * mirrors exactly: a gap of EXACTLY 30min starts a new session (merge
    * condition is strict `<`), and window end = last event + gap. */
  private val q74 = QDef(
    "q74_session_window",
    (s, dir) => Streams
      .sessionWindowAgg(Tables.load(s, dir, "events"), "30 minutes")
      .orderBy("user_id", "start_ms"),
    Some("""WITH x AS (
              SELECT user_id, event_id, epoch_ms(ts) AS ms,
                     lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events),
            y AS (
              SELECT *, CASE WHEN prev IS NULL OR ms - prev >= 1800000 THEN 1 ELSE 0 END AS brk
              FROM x),
            z AS (
              SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM y)
            SELECT user_id, min(ms) AS start_ms,
                   max(ms) + 1800000 AS end_ms,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM z GROUP BY user_id, sid ORDER BY user_id, start_ms"""))

  /** q187: native `session_window` aggregation through the REAL
    * micro-batch engine under q74's batch oracle — the one stateful
    * operator shape (`sessionWindowStateStoreSaveExec`) that was
    * spec-pinned but never contract-executed. Events are staged as three
    * TIME-ORDERED batches (fixed calendar cuts; the 1-minute watermark
    * delay plus time ordering means no real row ever arrives late) so the
    * state store must MERGE partial sessions across micro-batches: a
    * session straddling a batch cut stays open — the closure rule
    * `session.end <= watermark` guarantees no future event within the gap
    * can extend a closed session (an event that could extend it would be
    * within 30min of the last event, hence after watermark + delay) — and
    * is emitted merged. A far-future sentinel (user_id = -1, mtime-pinned
    * to arrive last) drives the terminal watermark past every real
    * session's end so append mode flushes them all; the sentinel's own
    * session ends beyond the terminal watermark and is held back, so the
    * terminal table is exactly the batch sessionization — q74's oracle
    * verbatim. */
  private val q187 = QDef(
    "q187_stream_session_window",
    (s, dir) => StreamSession(s) { ss =>
      val ev0 = Tables.load(ss, dir, "events")
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q187_").toString)
      def before(d: String) = col("ts") < to_timestamp(lit(d))
      val sentinel = ev0.limit(1)
        .withColumn("user_id", lit(-1L))
        .withColumn("ts", to_timestamp(lit("2099-01-01 00:00:00")))
      val inDir = Staging.stageBatches(
        Seq(ev0.where(before("2024-01-11 00:00:00")),
          ev0.where(!before("2024-01-11 00:00:00") &&
            before("2024-01-21 00:00:00")),
          ev0.where(!before("2024-01-21 00:00:00")),
          sentinel),
        tmp, pinMtime = true)
      val sink = "q187_stream_sink"
      val q = Streams.sessionWindowAgg(
          ss.readStream.schema(ev0.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir),
          gap = "30 minutes", watermark = Some("1 minute"))
        .writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink).orderBy("user_id", "start_ms")
    },
    q74.oracle)


  /** JSON extraction from the event props payload (Spark get_json_object;
    * oracle via regex so no DuckDB extension dependency). */
  private val q38 = QDef(
    "q38_json_extract",
    (s, dir) => Tables.load(s, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        count(when(col("k") > 50, 1)).as("n_high"))
      .orderBy("event_type"),
    Some("""SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
                   CAST(count(CASE WHEN CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) > 50 THEN 1 END) AS BIGINT) AS n_high
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** tf-idf-style salient terms per document: rank terms by term frequency,
    * tie-break by document frequency ascending (rarer wins) then term —
    * integer-only ranking, so both engines agree bit-for-bit. */
  private val q41 = QDef(
    "q41_top_terms",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("tf").desc, col("df").asc, col("term"))
      tf.join(dfreq, "term")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
        .orderBy("doc_id", "rank")
    },
    Some("""WITH tf AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
              FROM documents),
            tfc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
                    FROM tf GROUP BY doc_id, term),
            dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df
                    FROM tfc GROUP BY term),
            r AS (SELECT tfc.doc_id, tfc.term, tf, df,
                         row_number() OVER (PARTITION BY tfc.doc_id
                           ORDER BY tf DESC, df ASC, tfc.term) AS rank
                  FROM tfc JOIN dfc ON tfc.term = dfc.term)
            SELECT doc_id, term, tf, df, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 3 ORDER BY doc_id, rank"""))

  /** Train→test decontamination (GPT-3 Appendix C style): the 10%-of-docs
    * test split is checked for 13-gram overlap against the training split —
    * one shingle inverted-index equi-join, per-test-doc overlap counts.
    * Exact-integer output; the oracle builds the same 13-gram shingles via
    * list slicing. */
  private val q49 = QDef(
    "q49_contamination",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      TextDedup.contamination(
          docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text", n = 13)
        .orderBy("doc_id")
    },
    Some("""WITH d AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ws
                       FROM documents),
            sh0 AS (SELECT doc_id, array_to_string(ws[p : p+12], ' ') AS sh
                    FROM d, unnest(generate_series(1, greatest(len(ws)-12, 0))) AS t(p)),
            sh AS MATERIALIZED (SELECT DISTINCT doc_id, sh FROM sh0),
            tr AS (SELECT doc_id AS train_id, sh FROM sh WHERE doc_id % 10 <> 0),
            te AS (SELECT doc_id, sh FROM sh WHERE doc_id % 10 = 0),
            hits AS (SELECT te.doc_id AS hid,
                            CAST(count(DISTINCT te.sh) AS BIGINT) AS n_overlap_shingles,
                            CAST(count(DISTINCT tr.train_id) AS BIGINT) AS n_train_docs
                     FROM te JOIN tr ON te.sh = tr.sh GROUP BY te.doc_id),
            ids AS (SELECT DISTINCT doc_id FROM documents WHERE doc_id % 10 = 0)
            SELECT ids.doc_id,
                   coalesce(h.n_overlap_shingles, 0) AS n_overlap_shingles,
                   coalesce(h.n_train_docs, 0) AS n_train_docs,
                   coalesce(h.n_overlap_shingles, 0) >= 1 AS contaminated
            FROM ids LEFT JOIN hits h ON ids.doc_id = h.hid
            ORDER BY ids.doc_id"""))

  /** Cross-document repeated 8-gram spans per document (the exact-substring
    * dedup signal, Lee et al. 2021): occurrence counts and the duplicated
    * fraction — integer-exact arithmetic on both engines. */
  private val q61 = QDef(
    "q61_span_duplication",
    (s, dir) => TextDedup
      .spanDuplication(Tables.load(s, dir, "documents"), "doc_id", "text", n = 8)
      .orderBy("doc_id"),
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            occ AS (
              SELECT a.doc_id,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' ||
                       e.w || ' ' || f.w || ' ' || g.w || ' ' || h.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4
              JOIN w f ON f.doc_id = a.doc_id AND f.pos = a.pos + 5
              JOIN w g ON g.doc_id = a.doc_id AND g.pos = a.pos + 6
              JOIN w h ON h.doc_id = a.doc_id AND h.pos = a.pos + 7),
            dfreq AS (
              SELECT sh, count(*) AS ndocs
              FROM (SELECT DISTINCT doc_id, sh FROM occ) GROUP BY sh),
            per AS (
              SELECT occ.doc_id,
                     CAST(count(*) AS BIGINT) AS n_spans,
                     CAST(count(CASE WHEN ndocs > 1 THEN 1 END) AS BIGINT) AS n_shared_spans
              FROM occ JOIN dfreq ON occ.sh = dfreq.sh
              GROUP BY occ.doc_id)
            SELECT d.doc_id,
                   coalesce(per.n_spans, 0) AS n_spans,
                   coalesce(per.n_shared_spans, 0) AS n_shared_spans,
                   CASE WHEN coalesce(per.n_spans, 0) = 0 THEN 0.0
                        ELSE CAST(per.n_shared_spans AS DOUBLE) / per.n_spans
                   END AS shared_span_fraction
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN per ON d.doc_id = per.doc_id
            ORDER BY d.doc_id"""))

  /** Per-label embedding centroids ([[graft.ext.VectorAgg.groupedCentroids]])
    * — the one-pass distributed vector mean that refreshes an IVF index or
    * computes per-domain mixture means. Long format (label, pos, n,
    * centroid); integer-quantized sums make the result order-independent
    * and therefore bit-exact across engines (see VectorAgg scaladoc). The
    * oracle zips DuckDB's parallel unnest of the vector and its index
    * range. One shuffle of width labels × dim, corpus-size-independent. */
  private val q70 = QDef(
    "q70_centroids",
    (s, dir) => graft.ext.VectorAgg
      .groupedCentroids(embeddings(s, dir), "label", "embedding")
      .orderBy("label", "pos"),
    Some("""WITH ex AS (
              SELECT label,
                     unnest(range(len(embedding))) AS pos,
                     unnest(embedding) AS elem
              FROM embeddings)
            SELECT label, CAST(pos AS BIGINT) AS pos,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(CAST(elem AS DOUBLE)*1000000) AS BIGINT)) AS DOUBLE)
                     / (count(*) * 1000000.0) AS centroid
            FROM ex GROUP BY label, pos ORDER BY label, pos"""))

  /** Unigram-LM document scoring ([[TextAnalysis.unigramScore]]) — the
    * CCNet-style perplexity-filter shape with the LM trained on the corpus
    * itself. The hash gate covers the exact-integer columns and their one
    * IEEE division; the `ln`-based avg_logprob column is libm-sensitive and
    * is therefore asserted with tolerance in TrainPrepSpec instead. */
  private val q71 = QDef(
    "q71_unigram_lm",
    (s, dir) => TextAnalysis
      .unigramScore(Tables.load(s, dir, "documents"), "doc_id", "text")
      .drop("avg_logprob")
      .orderBy("doc_id"),
    Some("""WITH tok AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
            lm AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                   CAST(sum(cnt) AS BIGINT) AS freq_sum,
                   CAST(sum(cnt) AS DOUBLE) / count(*) AS avg_token_freq
            FROM tok JOIN lm USING (w)
            GROUP BY doc_id ORDER BY doc_id"""))

  /** Heavy-hitter words via the [[graft.functions.MisraGriesAgg]] sketch
    * (`approx_top_k`): the registered result is the guaranteed-heavy subset
    * — exact-count tokens above the n/(k+1) frequency threshold that the
    * sketch provably contains (no false negatives) — semi-joined against
    * the sketch output. The sketch itself is engine-specific state; the
    * guarantee it carries is engine-independent, so the oracle computes the
    * same heavy set exactly (the q26/q30 containment-oracle pattern). If
    * the sketch ever dropped a guaranteed item, the semi-join would shrink
    * the result and the hash gate would fail. k=512 counters per partition
    * vs a full-vocabulary shuffle — the 100 TB path for q54's exact top-k. */
  private val q73 = QDef(
    "q73_approx_heavy_words",
    (s, dir) => {
      val k = 512
      val tok = Tables.load(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      val exact = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
      val total = tok.agg(count(lit(1)).as("n"))
      val sk = tok
        .agg(call_function("approx_top_k", col("w"), lit(k)).as("sk"))
        .select(explode(col("sk")).as("e"))
        .select(col("e.item").as("w"))
      exact.crossJoin(broadcast(total))
        .where(col("cnt") * (k + 1) > col("n")) // cnt > n/(k+1), integer-exact
        .join(sk, Seq("w"), "left_semi")
        .select(col("w"), col("cnt"))
        .orderBy(desc("cnt"), asc("w"))
    },
    Some("""WITH tok AS (
              SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
            ex AS (SELECT w, count(*) AS cnt FROM tok GROUP BY w),
            tot AS (SELECT count(*) AS n FROM tok)
            SELECT w, CAST(cnt AS BIGINT) AS cnt FROM ex, tot
            WHERE cnt * 513 > n ORDER BY cnt DESC, w"""))

  /** End-to-end text cluster dedup ([[TextDedup.dedupClusters]] — the
    * document-side twin of q88): chain-contracted MinHash edges → min-id
    * components → one best-quality keeper per cluster. Buckets are
    * xxhash64-dependent, so the oracle pins the provable invariants, all
    * genuinely computed in Spark:
    *  - every cluster has exactly ONE keeper, and no member outscores it;
    *  - the clusters REFINE the exact-Jaccard transitive closure (every
    *    chain edge is a verified exact pair, so a cluster can never span
    *    two exact-closure components).
    * DuckDB reproduces the document count and pins the zeros. Clone-
    * cluster behavior (linear candidates, exact component recovery) is
    * DedupSpec-covered via the shared chained-edge machinery. */
  private val q94 = QDef(
    "q94_text_dedup_clusters",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val quality = docs.select(col("doc_id").as("id"),
        TextAnalysis.qualityScore(col("text")).as("quality"))
      // one shingle index + banding feeds BOTH the cluster pipeline and the
      // exact-closure refinement check (the q91 sharing pattern; the public
      // dedupClusters operator builds its own front end for API users)
      val (sh0, buckets) = TextDedup.minhashBuckets(docs, "doc_id", "text",
        ShingleN, numPerm = 16, bands = 4)
      val sh = sh0.localCheckpoint()
      val chainEdges = TextDedup.jaccardFromCounts(sh,
          TextDedup.candidateCommonCounts(sh, TextDedup.chainCandidates(buckets)), 0.5)
        .select(col("id_l").as("src"), col("id_r").as("dst"))
      val clusters = ClusterKeep.assignAndKeep(quality, chainEdges, None)
        .localCheckpoint()
      val a1 = clusters.agg(count(lit(1)).as("n_docs"))
      val perCluster = clusters.groupBy("cluster_id").agg(
        count(when(!col("is_dropped"), 1)).as("__k"),
        max(col("quality")).as("__qmax"),
        max(when(!col("is_dropped"), col("quality"))).as("__qkeep"))
      val a2 = perCluster
        .agg(count(when(col("__k") =!= 1, 1)).as("n_multi_keeper_clusters"))
      val a3 = perCluster
        .agg(count(when(col("__qkeep") < col("__qmax"), 1)).as("n_keeper_quality_violations"))
      val exactEdges = TextDedup.jaccardPairsOn(sh, 0.5)
        .select(col("id_l").as("src"), col("id_r").as("dst"))
      val ccExact = graft.graph.ConnectedComponents.runOnEdges(exactEdges)
      val a4 = clusters.join(ccExact, Seq("id"), "left_outer")
        .select(col("cluster_id"), coalesce(col("component"), col("id")).as("__ec"))
        .groupBy("cluster_id").agg(countDistinct(col("__ec")).as("__necc"))
        .agg(count(when(col("__necc") > 1, 1)).as("n_refinement_violations"))
      a1.crossJoin(a2).crossJoin(a3).crossJoin(a4)
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(0 AS BIGINT) AS n_multi_keeper_clusters,
                   CAST(0 AS BIGINT) AS n_keeper_quality_violations,
                   CAST(0 AS BIGINT) AS n_refinement_violations
            FROM documents"""))

  /** BM25 ranked retrieval over the documents corpus for three fixed topic
    * queries — the curation-pipeline "find documents about X" primitive.
    * Full value oracle: tf/df/dl are exact integers, the scalar expression
    * tree is mirrored operator-for-operator, and the score is rounded to 4
    * decimals pre-ranking in BOTH engines (the q43/q71 convention for
    * ln + order-dependent double sums). */
  private val q92 = QDef(
    "q92_bm25_topk",
    (s, dir) => {
      // SQL VALUES rather than Seq.toDF: no encoder derivation, so the
      // query builds identically under the REPL-backed plan tooling
      val queryTerms = s.sql(
        """SELECT CAST(query_id AS BIGINT) AS query_id, term
           FROM VALUES (1, 'hash'), (1, 'join'),
                       (2, 'vector'), (2, 'scan'), (2, 'filter'),
                       (3, 'customer'), (3, 'order') AS t(query_id, term)""")
      TextAnalysis.bm25TopK(Tables.load(s, dir, "documents"), "doc_id", "text",
          queryTerms, k = 10)
        .orderBy("query_id", "rank")
    },
    Some("""WITH q(query_id, term) AS (VALUES
              (1, 'hash'), (1, 'join'),
              (2, 'vector'), (2, 'scan'), (2, 'filter'),
              (3, 'customer'), (3, 'order')),
            tok AS (SELECT doc_id,
                           unnest(string_split_regex(lower(text), '\s+')) AS w
                    FROM documents),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
            dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
            parts AS (
              SELECT q.query_id, tf.doc_id,
                     ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * (1.2 + 1.0))
                       / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                            (CAST(sum_dl AS DOUBLE) / n_docs))) AS part
              FROM tf
              JOIN q ON q.term = tf.w
              JOIN dfreq USING (w)
              JOIN dl USING (doc_id)
              CROSS JOIN stats),
            scored AS (SELECT query_id, doc_id, round(sum(part), 4) AS bm25
                       FROM parts GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rank
                  FROM scored)
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, bm25,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** q163: hybrid retrieval via reciprocal-rank fusion
    * ([[graft.ext.Retrieval.rrfFuse]]) — the q92 BM25 lexical ranking and
    * a q28-style dense cosine ranking (query embeddings = vec_id 1–3,
    * matching the BM25 query ids) fused as `Σ 1/(60+rank)` and re-ranked.
    * The fused score is a fixed-order scalar over exact ranks — bit-stable
    * unrounded; upstream ranks reuse the already-oracled q92/q28
    * formulations verbatim (bm25 rounded to 4dp pre-rank, cosine exact
    * sequential dot product). */
  private val q163 = QDef(
    "q163_rrf_hybrid",
    (s, dir) => {
      val queryTerms = s.sql(
        """SELECT CAST(query_id AS BIGINT) AS query_id, term
           FROM VALUES (1, 'hash'), (1, 'join'),
                       (2, 'vector'), (2, 'scan'), (2, 'filter'),
                       (3, 'customer'), (3, 'order') AS t(query_id, term)""")
      val lex = TextAnalysis.bm25TopK(Tables.load(s, dir, "documents"),
          "doc_id", "text", queryTerms, k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val e = embeddings(s, dir)
      val den = Similarity.bruteForceTopK(e,
          e.filter(col("vec_id").isin(1L, 2L, 3L)), "vec_id", "embedding",
          k = 20)
        .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> den), k0 = 60,
          topK = 10)
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH q(query_id, term) AS (VALUES
              (1, 'hash'), (1, 'join'),
              (2, 'vector'), (2, 'scan'), (2, 'filter'),
              (3, 'customer'), (3, 'order')),
            tok AS (SELECT doc_id,
                           unnest(string_split_regex(lower(text), '\\s+')) AS w
                    FROM documents),
            tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY 1, 2),
            dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
            stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM dl),
            dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY 1),
            parts AS (
              SELECT q.query_id, tf.doc_id,
                     ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                       * (tf * (1.2 + 1.0))
                       / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl /
                            (CAST(sum_dl AS DOUBLE) / n_docs))) AS part
              FROM tf
              JOIN q ON q.term = tf.w
              JOIN dfreq USING (w)
              JOIN dl USING (doc_id)
              CROSS JOIN stats),
            lexsc AS (SELECT query_id, doc_id, round(sum(part), 4) AS bm25
                      FROM parts GROUP BY 1, 2),
            lex AS (SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY bm25 DESC, doc_id) AS rank
                    FROM lexsc QUALIFY rank <= 20),
            qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
                   FROM embeddings WHERE vec_id IN (1, 2, 3)),
            cv AS (SELECT vec_id AS doc_id, embedding::DOUBLE[] AS ne
                   FROM embeddings),
            den AS (SELECT query_id, doc_id,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY ${cosSql("qe", "ne")} DESC, doc_id) AS rank
                    FROM qv JOIN cv ON query_id <> doc_id
                    QUALIFY rank <= 20),
            u AS (SELECT query_id, doc_id, 'lex' AS rk, rank FROM lex
                  UNION ALL
                  SELECT query_id, doc_id, 'dense', rank FROM den),
            g AS (SELECT query_id, doc_id,
                         min(CASE WHEN rk = 'lex' THEN rank END) AS rank_lex,
                         min(CASE WHEN rk = 'dense' THEN rank END) AS rank_dense
                  FROM u GROUP BY 1, 2),
            sc AS (SELECT *,
                          coalesce(1.0 / (60.0 + rank_lex), 0.0) +
                            coalesce(1.0 / (60.0 + rank_dense), 0.0) AS rrf
                   FROM g),
            r AS (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf DESC, doc_id) AS rank FROM sc)
            SELECT query_id, doc_id, rank_lex, rank_dense, rrf,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 10 ORDER BY query_id, rank"""))

  /** q166: Count-Min point-frequency estimation
    * ([[graft.functions.CmsAgg]] / `cms_sketch` + `cms_estimate`) — one
    * 4×2048-counter sketch over all lineitem partkeys, probed for every
    * 100th part and gated like q93/q155/q157: exact counts are the
    * hash-compared columns; the estimates are asserted genuinely in
    * Spark to (a) never underestimate — the CMS one-sided guarantee,
    * deterministic, and (b) overestimate by ≤ 5·N/width (measured max
    * 1.95 across sf0.01/sf0.1 over ALL keys; the 2.5× margin keeps the
    * assertion robust to testdata regeneration — sketch counters are
    * exact integer sums, so values are deterministic per corpus). */
  private val q166 = QDef(
    "q166_cms_frequency",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").cast("string").as("__k"), col("l_partkey"))
      val sk = li.agg(
        call_function("cms_sketch", col("__k"), lit(4), lit(2048)).as("__sk"),
        count(lit(1)).as("__n"))
      val probes = li.where(col("l_partkey") % 100 === 0)
        .groupBy("l_partkey").agg(count(lit(1)).as("exact_cnt"))
      probes.crossJoin(broadcast(sk))
        .withColumn("__est", call_function("cms_estimate", col("__sk"),
          col("l_partkey").cast("string"), lit(4), lit(2048)))
        .select(col("l_partkey"), col("exact_cnt"),
          (col("__est") >= col("exact_cnt")).as("never_under"),
          (col("__est") <= col("exact_cnt") +
            lit(5.0) * col("__n").cast("double") / lit(2048.0))
            .as("within_bound"))
        .orderBy("l_partkey")
    },
    Some("""SELECT l_partkey, CAST(count(*) AS BIGINT) AS exact_cnt,
                   TRUE AS never_under, TRUE AS within_bound
            FROM lineitem WHERE l_partkey % 100 = 0
            GROUP BY l_partkey ORDER BY l_partkey"""))

  /** Per-language approximate distinct-token cardinality (HyperLogLog++,
    * `approx_count_distinct` at rsd 0.05) validated against the exact
    * count — the 100 TB cardinality-estimation primitive (an exact
    * distinct over a web-scale vocabulary is a full shuffle; the sketch is
    * O(kB) mergeable state per group). The sketch value itself is
    * engine-specific, so the gated columns are the exact count plus a
    * within-4x-rsd assertion computed genuinely in Spark; DuckDB
    * reproduces the exact side and pins the assertion true (the q26/q73
    * containment-oracle pattern). */
  private val q93 = QDef(
    "q93_approx_cardinality",
    (s, dir) => Tables.load(s, dir, "documents")
      .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("lang")
      .agg(countDistinct(col("w")).as("exact_distinct"),
        approx_count_distinct(col("w"), 0.05).as("__approx"))
      .select(col("lang"), col("exact_distinct"),
        (abs(col("__approx") - col("exact_distinct")).cast("double") <=
          lit(0.2) * col("exact_distinct")).as("within_bound"))
      .orderBy("lang"),
    Some("""SELECT lang,
                   CAST(count(DISTINCT w) AS BIGINT) AS exact_distinct,
                   TRUE AS within_bound
            FROM (SELECT lang,
                         unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
            GROUP BY lang ORDER BY lang"""))

  // ---------- data layout ----------

  /** Z-order (Morton) curve values over (customer, order-day) — the
    * multi-dimensional clustering key behind `Sources.zOrderLayout`
    * (Delta/Iceberg `OPTIMIZE ZORDER BY`'s core). The codegen'd
    * `z_value` expression's bit contract (LSB-first, column-major — see
    * [[graft.functions.ZOrderAlgo]]) is deterministic pure bit
    * arithmetic, so the oracle replicates it term-for-term with SQL
    * shifts; the layout's footer-stats skipping effect is measured in
    * ZOrderSpec (judge path: parquet row-group min/max spans bounded on
    * BOTH dimensions, vs a single-sort layout's unbounded second dim). */
  private val q95 = QDef(
    "q95_zorder_curve",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      o.select(col("o_orderkey"),
          call_function("z_value",
            col("o_custkey"),
            datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
              .cast("long")).as("zv"))
        .orderBy("zv", "o_orderkey")
        .limit(200)
    },
    Some {
      // bit b of column j lands at output position b*n + j (n=2, bits=31):
      // custkey (j=0) -> 2b, order-day (j=1) -> 2b+1. Terms are disjoint
      // bits, so + == | and the sum stays inside BIGINT (max shift 61).
      val terms = (0 until 31).flatMap(b => Seq(
        s"(((a >> $b) & 1) << ${2 * b})",
        s"(((b >> $b) & 1) << ${2 * b + 1})")).mkString(" + ")
      s"""WITH t AS (SELECT o_orderkey,
                 CAST(o_custkey AS BIGINT) AS a,
                 CAST(date_diff('day', DATE '1992-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT) AS b
               FROM orders)
          SELECT o_orderkey, ($terms) AS zv
          FROM t ORDER BY zv, o_orderkey LIMIT 200"""
    })

  /** FastText-style hashed linear quality classifier
    * ([[TextAnalysis.hashedLinearScore]] with the deterministic stub
    * weights) — every stage is exact integer arithmetic (portable token
    * code → Knuth multiplicative bucket → integer milli-weights → exact
    * sum → integer-comparison gate), so the oracle mirrors the classifier
    * end-to-end including the keep decision. */
  private val q96 = QDef(
    "q96_quality_classifier",
    (s, dir) => TextAnalysis
      .hashedLinearScore(Tables.load(s, dir, "documents"), "doc_id", "text", dim = 1024)
      .orderBy("doc_id"),
    Some("""WITH w AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
            b AS (
              SELECT doc_id,
                     ((ascii(w) * 961
                       + CASE WHEN length(w) >= 2 THEN ascii(substr(w, 2, 1)) ELSE 0 END * 31
                       + length(w)) * 2654435761) % 1000000007 % 1024 AS b
              FROM w),
            s AS (
              SELECT doc_id,
                     SUM((b * 48271) % 2001 - 1000) AS raw_sum,
                     COUNT(*) AS n_tokens
              FROM b GROUP BY doc_id)
            SELECT d.doc_id,
                   CAST(coalesce(s.raw_sum, 0) AS BIGINT) AS raw_sum,
                   CAST(coalesce(s.n_tokens, 0) AS BIGINT) AS n_tokens,
                   coalesce(s.raw_sum, 0) > 0 AS keep
            FROM documents d LEFT JOIN s USING (doc_id)
            ORDER BY d.doc_id"""))

  /** Hard-negative mining ([[Similarity.hardNegatives]]): per query, the
    * top-5 most-similar corpus vectors with a DIFFERENT label — the
    * contrastive-training pair miner. Same bit-stable scalar cosine as
    * q28, so the oracle mirrors the whole selection including the label
    * inequality. */
  private val q97 = QDef(
    "q97_hard_negatives",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", "label", 5)
        .withColumn("neighbor_label", col("neighbor_label").cast("long"))
        .orderBy("query_id", "rank")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                              label AS ql
                       FROM embeddings WHERE vec_id < 8),
                 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv,
                              label AS nl
                       FROM embeddings),
                 sc AS (
                   SELECT query_id, neighbor_id,
                          CAST(nl AS BIGINT) AS neighbor_label,
                          list_dot_product(qv, nv) /
                            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
                   FROM q JOIN c ON query_id <> neighbor_id AND ql <> nl),
                 r AS (SELECT *, row_number() OVER (
                         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                       FROM sc)
            SELECT query_id, neighbor_id, neighbor_label, cosine,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** kNN label prediction ([[Similarity.knnPredict]]): majority-vote the
    * top-5 neighbors' labels per query — the embedding-quality eval /
    * weak-labeling primitive. Votes are exact integers with deterministic
    * tie-breaks (smaller label wins; rank ties to smaller neighbor id),
    * so the oracle mirrors the complete prediction. */
  private val q98 = QDef(
    "q98_knn_predict",
    (s, dir) => {
      val e = embeddings(s, dir)
      Similarity.knnPredict(e, e.filter(col("vec_id") < 16),
          "vec_id", "embedding", "label", 5)
        .orderBy("query_id")
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
                              label AS tl
                       FROM embeddings WHERE vec_id < 16),
                 c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS nv,
                              label AS nl
                       FROM embeddings),
                 sc AS (
                   SELECT query_id, tl, neighbor_id, nl,
                          list_dot_product(qv, nv) /
                            (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(nv, nv))) AS cosine
                   FROM q JOIN c ON query_id <> neighbor_id),
                 topk AS (SELECT * FROM (
                            SELECT *, row_number() OVER (
                              PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS r
                            FROM sc) WHERE r <= 5),
                 v AS (SELECT query_id, tl, nl, count(*) AS votes
                       FROM topk GROUP BY query_id, tl, nl),
                 p AS (SELECT * FROM (
                         SELECT *, row_number() OVER (
                           PARTITION BY query_id ORDER BY votes DESC, nl) AS vr
                         FROM v) WHERE vr = 1)
            SELECT query_id, CAST(tl AS BIGINT) AS true_label,
                   CAST(nl AS BIGINT) AS predicted_label,
                   CAST(votes AS BIGINT) AS votes
            FROM p ORDER BY query_id"""))

  // ---------- evaluation diagnostics ----------

  /** Distributed exact ROC-AUC ([[Eval.auc]]) of the hashed-linear quality
    * score (q96's raw_sum) against the lang=='en' label — the measurement
    * step after training any corpus-quality classifier. Integer raw_sum
    * scores collide heavily, so this exercises the midrank tie correction;
    * every sum is an exact integer and the one double division at the end
    * is replicated verbatim, so the oracle checks the full AUC value. */
  private val q100 = QDef(
    "q100_auc",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = TextAnalysis
        .hashedLinearScore(docs, "doc_id", "text", dim = 1024)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      Eval.auc(scored, col("raw_sum"), col("lang") === "en")
    },
    Some("""WITH w AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
            b AS (
              SELECT doc_id,
                     ((ascii(w) * 961
                       + CASE WHEN length(w) >= 2 THEN ascii(substr(w, 2, 1)) ELSE 0 END * 31
                       + length(w)) * 2654435761) % 1000000007 % 1024 AS b
              FROM w),
            s AS (
              SELECT doc_id, SUM((b * 48271) % 2001 - 1000) AS raw_sum
              FROM b GROUP BY doc_id),
            lbl AS (
              SELECT coalesce(s.raw_sum, 0) AS score, d.lang = 'en' AS pos
              FROM documents d LEFT JOIN s USING (doc_id)),
            g AS (
              SELECT score,
                     SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS pos,
                     SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS neg
              FROM lbl GROUP BY score),
            c AS (
              SELECT pos, neg,
                     coalesce(SUM(neg) OVER (ORDER BY score
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS neg_below
              FROM g)
            SELECT CAST(SUM(pos) AS BIGINT) AS pos_total,
                   CAST(SUM(neg) AS BIGINT) AS neg_total,
                   CASE WHEN SUM(pos) > 0 AND SUM(neg) > 0 THEN
                     CAST(SUM(pos * (2 * neg_below + neg)) AS DOUBLE)
                       / (CAST(SUM(pos) AS DOUBLE) * SUM(neg) * 2.0)
                   END AS auc
            FROM c"""))

  /** ANN recall@5 ([[Eval.recallAtK]]): single-probe hyperplane LSH (q30's
    * pipeline) measured against brute force (q28's) — the quality gate an
    * ANN index ships with. The oracle mirrors BOTH arms (plane literals
    * again) and the per-query hit count, so the recall values themselves
    * are value-hash checked. */
  private val q101 = QDef(
    "q101_ann_recall",
    (s, dir) => {
      val e = embeddings(s, dir)
      val qs = e.filter(col("vec_id") < 8)
      val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", 5)
      val approx = Similarity.lshTopK(e, qs, "vec_id", "embedding",
        k = 5, numPlanes = 8, dim = 64)
      Eval.recallAtK(exact, approx, "query_id", "neighbor_id", 5)
        .orderBy("query_id")
    },
    Some {
      val planes = Similarity.hyperplanes(8, 64)
      s"""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
          q AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < 8),
          ex_sc AS (SELECT query_id, vec_id AS neighbor_id,
                           ${cosSql("qv", "ve")} AS cosine
                    FROM v JOIN q ON query_id <> vec_id),
          ex AS (SELECT query_id, neighbor_id FROM (
                   SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                   FROM ex_sc) WHERE rank <= 5),
          b AS (SELECT vec_id, ve, ${bucketSql(planes)} AS bucket FROM v),
          qb AS (SELECT vec_id AS query_id, ve AS qv, bucket FROM b WHERE vec_id < 8),
          ap_sc AS (SELECT query_id, vec_id AS neighbor_id,
                           ${cosSql("qv", "ve")} AS cosine
                    FROM b JOIN qb USING (bucket)
                    WHERE query_id <> vec_id),
          ap AS (SELECT query_id, neighbor_id FROM (
                   SELECT *, row_number() OVER (
                     PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
                   FROM ap_sc) WHERE rank <= 5),
          j AS (SELECT ex.query_id,
                       CASE WHEN ap.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM ex LEFT JOIN ap
                  ON ap.query_id = ex.query_id AND ap.neighbor_id = ex.neighbor_id)
          SELECT query_id, CAST(count(*) AS BIGINT) AS exact_k,
                 CAST(SUM(hit) AS BIGINT) AS hits,
                 CAST(SUM(hit) AS DOUBLE) / count(*) AS recall
          FROM j GROUP BY query_id ORDER BY query_id"""
    })

  /** Cross-source 5-gram overlap matrix ([[Eval.sourceOverlap]]) — the
    * corpus-contamination diagnostic ("how much of source A is also in
    * source B"). Per-shingle join fan-out is bounded by the source count
    * (distinct (source, shingle) index), so this is safe however many
    * documents share a boilerplate shingle. */
  private val q102 = QDef(
    "q102_source_overlap",
    (s, dir) => Eval
      .sourceOverlap(Tables.load(s, dir, "documents"), "source", "text", n = 5)
      .orderBy("source_l", "source_r"),
    Some("""WITH w AS (
              SELECT doc_id, source,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            sh AS MATERIALIZED (
              SELECT DISTINCT a.source,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sizes AS MATERIALIZED (SELECT source, count(*) AS sz FROM sh GROUP BY source),
            inter AS (
              SELECT x.source AS source_l, y.source AS source_r,
                     count(*) AS common
              FROM sh x JOIN sh y ON x.sh = y.sh AND x.source < y.source
              GROUP BY 1, 2)
            SELECT source_l, source_r, CAST(common AS BIGINT) AS common,
                   CAST(sa.sz AS BIGINT) AS sz_l, CAST(sb.sz AS BIGINT) AS sz_r,
                   CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.source = source_l
            JOIN sizes sb ON sb.source = source_r
            ORDER BY source_l, source_r"""))

  /** Product-quantized ANN ([[graft.ext.Pq]]): strided training-free
    * codebooks (IVF's device), integer-quantized distance tables, codegen'd
    * `pq_adc` scan. Nothing is hash-dependent — seeds, argmin encoding,
    * table quantization and the exact-integer ADC sum are all mirrored in
    * SQL, so the full pipeline (codes, tables, ranking) is value-hash
    * checked. */
  private val q103 = QDef(
    "q103_pq_topk",
    (s, dir) => {
      val e = embeddings(s, dir)
      graft.ext.Pq.topK(e, e.filter(col("vec_id") < 8), "vec_id", "embedding",
        k = 5, dim = 64, m = 8, ksub = 16, stride = 20)
        .orderBy("query_id", "rank")
    },
    Some("""WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
            ss AS (SELECT unnest(range(8)) AS s),
            seeds AS (SELECT * FROM (
                        SELECT ve, row_number() OVER (ORDER BY vec_id) - 1 AS j
                        FROM v WHERE vec_id % 20 = 0) WHERE j < 16),
            cb AS (SELECT s, j, ve[s*8+1 : (s+1)*8] AS cv FROM seeds CROSS JOIN ss),
            subc AS (SELECT vec_id, s, ve[s*8+1 : (s+1)*8] AS sv FROM v CROSS JOIN ss),
            codes AS (SELECT vec_id, s, j AS code FROM (
                        SELECT c.vec_id, cb.s, cb.j,
                               row_number() OVER (PARTITION BY c.vec_id, cb.s ORDER BY
                                 list_dot_product(c.sv, c.sv)
                                   - 2 * list_dot_product(c.sv, cb.cv)
                                   + list_dot_product(cb.cv, cb.cv),
                                 cb.j) AS rn
                        FROM subc c JOIN cb USING (s)) WHERE rn = 1),
            q AS (SELECT vec_id AS query_id, s, ve[s*8+1 : (s+1)*8] AS qv
                  FROM v CROSS JOIN ss WHERE vec_id < 8),
            tbl AS (SELECT query_id, s, j,
                           CAST(floor((list_dot_product(qv, qv)
                                         - 2 * list_dot_product(qv, cv)
                                         + list_dot_product(cv, cv))
                                      * 1048576.0 + 0.5) AS BIGINT) AS entry
                    FROM q JOIN cb USING (s)),
            adc AS (SELECT t.query_id, c.vec_id AS neighbor_id,
                           SUM(t.entry) AS adc
                    FROM codes c JOIN tbl t ON t.s = c.s AND t.j = c.code
                    WHERE t.query_id <> c.vec_id
                    GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS rank
                  FROM adc)
            SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** Calibration bins ([[Eval.calibrationBins]]) of the q96 quality score
    * against the lang=='en' label — q100's AUC measures discrimination,
    * this measures calibration (reliability-diagram data). Integer score
    * sums keep every aggregate exact; the two divisions are mirrored. */
  private val q104 = QDef(
    "q104_calibration",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val scored = TextAnalysis
        .hashedLinearScore(docs, "doc_id", "text", dim = 1024)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      Eval.calibrationBins(scored, col("raw_sum"), col("lang") === "en",
        lo = -40000L, hi = 40000L, bins = 16)
        .orderBy("bin")
    },
    Some("""WITH w AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS w
              FROM documents),
            b AS (
              SELECT doc_id,
                     ((ascii(w) * 961
                       + CASE WHEN length(w) >= 2 THEN ascii(substr(w, 2, 1)) ELSE 0 END * 31
                       + length(w)) * 2654435761) % 1000000007 % 1024 AS b
              FROM w),
            s AS (
              SELECT doc_id, SUM((b * 48271) % 2001 - 1000) AS raw_sum
              FROM b GROUP BY doc_id),
            lbl AS (
              SELECT CAST(coalesce(s.raw_sum, 0) AS BIGINT) AS score,
                     d.lang = 'en' AS pos
              FROM documents d LEFT JOIN s USING (doc_id)),
            binned AS (
              SELECT least(greatest(
                       CAST(floor((CAST(score AS DOUBLE) - (-40000)) / 5000.0) AS BIGINT),
                       0), 15) AS bin,
                     score, pos
              FROM lbl)
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS pos,
                   CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS frac_pos,
                   CAST(SUM(score) AS DOUBLE) / count(*) AS mean_score
            FROM binned GROUP BY bin ORDER BY bin"""))

  /** IVF-PQ ANN ([[graft.ext.IvfPq]]): coarse L2 lists + product-quantized
    * residuals + selective probing — the FAISS IndexIVFPQ composition.
    * Deterministic end-to-end (strided seeds with the residual offset,
    * argmin tie-breaks, fixed-point tables, exact integer ADC), so the
    * oracle mirrors the complete pipeline: assignment, residuals, residual
    * codebook, codes, probes, per-list tables, ranking. */
  /** The q105 oracle's CTE chain (the complete IVF-PQ mirror: coarse
    * assignment, residuals, residual codebook, codes, probes, tables,
    * ADC ranking) — shared with q148, which re-ranks its shortlist. */
  private val ivfpqShortlistSql =
    """WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
            ss AS (SELECT unnest(range(8)) AS s),
            cent AS (SELECT vec_id AS list_id, ve AS cv FROM v WHERE vec_id % 20 = 0),
            asg AS (SELECT vec_id, list_id,
                           list_transform(range(1, 65), i -> ve[i] - cv[i]) AS rv
                    FROM (
                      SELECT v.vec_id, v.ve, c.list_id, c.cv,
                             row_number() OVER (PARTITION BY v.vec_id ORDER BY
                               list_dot_product(v.ve, v.ve)
                                 - 2 * list_dot_product(v.ve, c.cv)
                                 + list_dot_product(c.cv, c.cv),
                               c.list_id) AS rn
                      FROM v CROSS JOIN cent c) WHERE rn = 1),
            seeds AS (SELECT * FROM (
                        SELECT rv, row_number() OVER (ORDER BY vec_id) - 1 AS j
                        FROM asg WHERE vec_id % 20 = 7) WHERE j < 16),
            cb AS (SELECT s, j, rv[s*8+1 : (s+1)*8] AS cv FROM seeds CROSS JOIN ss),
            subc AS (SELECT vec_id, s, rv[s*8+1 : (s+1)*8] AS sv FROM asg CROSS JOIN ss),
            codes AS (SELECT vec_id, s, j AS code FROM (
                        SELECT c.vec_id, cb.s, cb.j,
                               row_number() OVER (PARTITION BY c.vec_id, cb.s ORDER BY
                                 list_dot_product(c.sv, c.sv)
                                   - 2 * list_dot_product(c.sv, cb.cv)
                                   + list_dot_product(cb.cv, cb.cv),
                                 cb.j) AS rn
                        FROM subc c JOIN cb USING (s)) WHERE rn = 1),
            q0 AS (SELECT vec_id AS query_id, ve AS qv FROM v WHERE vec_id < 8),
            probes AS (SELECT query_id, list_id,
                              list_transform(range(1, 65), i -> qv[i] - cv[i]) AS rq
                       FROM (
                         SELECT q0.query_id, q0.qv, c.list_id, c.cv,
                                row_number() OVER (PARTITION BY q0.query_id ORDER BY
                                  list_dot_product(q0.qv, q0.qv)
                                    - 2 * list_dot_product(q0.qv, c.cv)
                                    + list_dot_product(c.cv, c.cv),
                                  c.list_id) AS rn
                         FROM q0 CROSS JOIN cent c) WHERE rn <= 4),
            tbl AS (SELECT query_id, list_id, p.s, cb.j,
                           CAST(floor((list_dot_product(p.qs, p.qs)
                                         - 2 * list_dot_product(p.qs, cb.cv)
                                         + list_dot_product(cb.cv, cb.cv))
                                      * 1048576.0 + 0.5) AS BIGINT) AS entry
                    FROM (SELECT query_id, list_id, s, rq[s*8+1 : (s+1)*8] AS qs
                          FROM probes CROSS JOIN ss) p
                    JOIN cb ON cb.s = p.s),
            adcx AS (SELECT t.query_id, c.vec_id AS neighbor_id,
                            SUM(t.entry) AS adc
                     FROM (SELECT codes.vec_id, codes.s, codes.code, asg.list_id
                           FROM codes JOIN asg USING (vec_id)) c
                     JOIN tbl t ON t.list_id = c.list_id AND t.s = c.s
                               AND t.j = c.code
                     WHERE t.query_id <> c.vec_id
                     GROUP BY 1, 2),
            r AS (SELECT *, row_number() OVER (
                    PARTITION BY query_id ORDER BY adc ASC, neighbor_id) AS rank
                  FROM adcx)"""

  private val q105 = QDef(
    "q105_ivfpq_topk",
    (s, dir) => {
      val e = embeddings(s, dir)
      graft.ext.IvfPq.topK(e, e.filter(col("vec_id") < 8), "vec_id",
        "embedding", k = 5, dim = 64, m = 8, ksub = 16,
        ivfStride = 20, seedStride = 20, nProbe = 4)
        .orderBy("query_id", "rank")
    },
    Some(s"""$ivfpqShortlistSql
            SELECT query_id, neighbor_id, CAST(adc AS BIGINT) AS adc,
                   CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** q148: two-stage retrieval ([[graft.ext.IvfPq.topKReranked]]) — the
    * q105 IVF-PQ pipeline widened to a 20-candidate shortlist, then
    * exact-cosine re-rank of only those candidates (FAISS refine-flat
    * composition). Oracle reuses the full q105 mirror and re-ranks with
    * the q28 cosine expression — bit-equal sequential IEEE dot products
    * in both engines. */
  private val q148 = QDef(
    "q148_ivfpq_rerank",
    (s, dir) => {
      val e = embeddings(s, dir)
      graft.ext.IvfPq.topKReranked(e, e.filter(col("vec_id") < 8),
        "vec_id", "embedding", k = 5, shortlist = 20, dim = 64, m = 8,
        ksub = 16, ivfStride = 20, seedStride = 20, nProbe = 4)
        .orderBy("query_id", "rank")
    },
    Some(s"""$ivfpqShortlistSql,
            cand AS (SELECT query_id, neighbor_id
                     FROM r WHERE rank <= 20),
            sc AS (SELECT c.query_id, c.neighbor_id,
                          list_dot_product(q.ve, n.ve) /
                            (sqrt(list_dot_product(q.ve, q.ve)) *
                             sqrt(list_dot_product(n.ve, n.ve))) AS cosine
                   FROM cand c
                   JOIN v q ON q.vec_id = c.query_id
                   JOIN v n ON n.vec_id = c.neighbor_id),
            rr AS (SELECT *, row_number() OVER (
                     PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
                   FROM sc)
            SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
            FROM rr WHERE rank <= 5 ORDER BY query_id, rank"""))

  /** q133: bigram-LM document scoring ([[TextAnalysis.bigramScore]]) —
    * the corpus's own bigram table as the LM. Exact-integer columns plus
    * one IEEE division are hash-gated; the `ln`-based `avg_logprob` is
    * libm-sensitive and spec-asserted instead (the q71 convention). */
  private val q133 = QDef(
    "q133_bigram_lm",
    (s, dir) => TextAnalysis
      .bigramScore(Tables.load(s, dir, "documents"), "doc_id", "text")
      .drop("avg_logprob")
      .orderBy("doc_id"),
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            b AS (SELECT a.doc_id, a.w AS w1, a.w || ' ' || b.w AS bg
                  FROM w a JOIN w b
                    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            lm2 AS (SELECT bg, count(*) AS c2 FROM b GROUP BY bg),
            lm1 AS (SELECT w1, count(*) AS c1 FROM b GROUP BY w1)
            SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
                   CAST(sum(c2) AS BIGINT) AS freq_sum,
                   CAST(sum(c2) AS DOUBLE) / count(*) AS avg_bigram_freq
            FROM b JOIN lm2 USING (bg) JOIN lm1 USING (w1)
            GROUP BY doc_id ORDER BY doc_id"""))

  /** q142: exact-integer PCA scatter matrix over the embedding corpus
    * ([[Pca.scatterMatrix]]) — the upper-triangle second-moment sums on a
    * fixed quantization grid, accumulated in a per-partition kernel
    * (commutative long adds: partitioning-invariant, hash-gatable). The
    * dominant component itself is the tiny-matrix driver step, spec-gated
    * in PcaSpec. */
  private val q142 = QDef(
    "q142_scatter_matrix",
    (s, dir) => Pca
      .scatterMatrix(Tables.load(s, dir, "embeddings"), "embedding")
      .orderBy("i", "j"),
    Some("""WITH x AS (SELECT vec_id, unnest(embedding) AS v,
                              generate_subscripts(embedding, 1) AS i
                       FROM embeddings),
                 q AS (SELECT vec_id, i,
                              CAST(floor(CAST(v AS DOUBLE) * 10000 + 0.5)
                                   AS BIGINT) AS xq
                       FROM x)
            SELECT CAST(a.i - 1 AS BIGINT) AS i, CAST(b.i - 1 AS BIGINT) AS j,
                   CAST(sum(a.xq * b.xq) AS BIGINT) AS s
            FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i >= a.i
            GROUP BY 1, 2 ORDER BY i, j"""))

  // ---------- MinHash MirrorMode value mirrors ----------
  // q26/q91 certify the XxMode scale pipeline on provable invariants
  // (xxhash64 is not ANSI-reproducible); these rows run the SAME pipeline
  // in [[TextDedup.MirrorMode]] and the oracle recomputes every value —
  // base hashes, signatures, BUCKET IDS, candidate sets, verified jaccards
  // — so the banding algebra itself is hash-certified, not just bounded.

  /** DuckDB CTE fragment recomputing the MirrorMode MinHash front end
    * value-for-value: 5-gram shingles → polynomial char hash
    * ([[TextDedup.strHash]]) → affine Carter–Wegman permutations
    * ([[TextDedup.mirrorPermA]]/[[mirrorPermB]]) → multiplicative band
    * fold. Caller appends its own CTEs/SELECT after this fragment. */
  private def mirrorMinhashCtes(src: String, numPerm: Int, bands: Int): String = {
    val P = 1000000007L
    val sigs = (0 until numPerm).map(i =>
      s"min((h * ${TextDedup.mirrorPermA(i)} + ${TextDedup.mirrorPermB(i)}) % $P) AS s$i")
      .mkString(",\n                     ")
    val r = numPerm / bands
    val bandArms = (0 until bands).map { b =>
      val bucket = (b * r until (b + 1) * r)
        .foldLeft((b + 1).toString)((acc, i) => s"(($acc) * 2654435761 + s$i) % $P")
      s"SELECT doc_id, $b AS band, CAST($bucket AS BIGINT) AS bucket FROM sig"
    }.mkString("\n              UNION ALL\n              ")
    s"""w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS pos
              FROM $src),
            sh AS MATERIALIZED (
              SELECT DISTINCT a.doc_id,
                     a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
              FROM w a
              JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
              JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
              JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            hh AS MATERIALIZED (
              SELECT doc_id, sh,
                     list_reduce(
                       list_prepend(CAST(0 AS BIGINT),
                         list_transform(string_split(sh, ''),
                           c -> CAST(unicode(c) AS BIGINT))),
                       (a, c) -> (a * 31 + c) % $P) AS h
              FROM sh),
            sig AS MATERIALIZED (
              SELECT doc_id,
                     $sigs
              FROM hh GROUP BY doc_id),
            bk AS MATERIALIZED (
              $bandArms)"""
  }

  /** Shared verification tail: exact common counts over the candidate set
    * `cand(id_l, id_r)`, jaccard from set sizes, threshold filter. */
  private def mirrorVerifyTail: String =
    """sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
            inter AS (
              SELECT c.id_l, c.id_r, count(*) AS common
              FROM cand c
              JOIN sh x ON x.doc_id = c.id_l
              JOIN sh y ON y.doc_id = c.id_r AND y.sh = x.sh
              GROUP BY 1, 2)
            SELECT id_l, id_r,
                   CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_l
            JOIN sizes sb ON sb.doc_id = id_r
            WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= 0.5
            ORDER BY id_l, id_r"""

  /** q188: [[TextDedup.minhashLshPairs]] (q26's pairwise-banding shape) in
    * MirrorMode under a FULL value mirror — DuckDB recomputes signatures,
    * buckets, bucket-collision candidates, and the verified jaccards; the
    * hash encodes the whole pair set value-for-value. */
  private val q188 = QDef(
    "q188_minhash_mirror_pairs",
    (s, dir) => TextDedup.minhashLshPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", ShingleN, numPerm = 16, bands = 4, threshold = 0.5,
        mode = TextDedup.MirrorMode)
      .orderBy("id_l", "id_r"),
    Some(s"""WITH ${mirrorMinhashCtes("documents", 16, 4)},
            cand AS (
              SELECT DISTINCT a.doc_id AS id_l, b.doc_id AS id_r
              FROM bk a JOIN bk b
                ON b.band = a.band AND b.bucket = a.bucket
               AND a.doc_id < b.doc_id),
            $mirrorVerifyTail"""))

  /** q189: the MirrorMode banding table itself — every (doc_id, band,
    * BUCKET ID) row recomputed by DuckDB, pinning the signature/band
    * algebra bit-for-bit (the strongest possible oracle for the LSH front
    * end; docs shorter than the shingle width are absent on both sides). */
  private val q189 = QDef(
    "q189_minhash_mirror_buckets",
    (s, dir) => {
      val (_, bk) = TextDedup.minhashBuckets(Tables.load(s, dir, "documents"),
        "doc_id", "text", ShingleN, numPerm = 16, bands = 4,
        mode = TextDedup.MirrorMode)
      bk.select(col("id").as("doc_id"), col("band").cast("long").as("band"),
          col("bucket"))
        .orderBy("doc_id", "band")
    },
    Some(s"""WITH ${mirrorMinhashCtes("documents", 16, 4)}
            SELECT doc_id, CAST(band AS BIGINT) AS band, bucket
            FROM bk ORDER BY doc_id, band"""))

  /** q190: [[TextDedup.minhashLshEdgesChained]] (q91's chain-contracted
    * shape) in MirrorMode under a full value mirror — the lag-window chain
    * candidates and their verified jaccards recomputed by DuckDB. */
  private val q190 = QDef(
    "q190_minhash_mirror_chained",
    (s, dir) => TextDedup.minhashLshEdgesChained(Tables.load(s, dir, "documents"),
        "doc_id", "text", ShingleN, numPerm = 16, bands = 4, threshold = 0.5,
        mode = TextDedup.MirrorMode)
      .orderBy("id_l", "id_r"),
    Some(s"""WITH ${mirrorMinhashCtes("documents", 16, 4)},
            chain AS (
              SELECT lag(doc_id) OVER (PARTITION BY band, bucket
                                       ORDER BY doc_id) AS id_l,
                     doc_id AS id_r
              FROM bk),
            cand AS (SELECT DISTINCT id_l, id_r FROM chain WHERE id_l IS NOT NULL),
            $mirrorVerifyTail"""))

  /** q194: cross-document boilerplate removal
    * ([[TextDedup.stripCommonSegments]] — the CCNet/C4 paragraph-dedup
    * step re-expressed over fixed 5-word segments, since the synthetic
    * corpus has no newlines) under a FULL value mirror: DuckDB recomputes
    * the segmentation, the per-segment document frequency, the >= 3-doc
    * heavy set, and reassembles every cleaned document word-for-word, so
    * the hash encodes the exact dropped-segment choreography. */
  private val q194 = QDef(
    "q194_boilerplate_strip",
    (s, dir) => TextDedup.stripCommonSegments(Tables.load(s, dir, "documents"),
        "doc_id", "text", segWords = 5, minDocFreq = 3)
      .select(col("id").as("doc_id"), col("clean_text"),
        col("n_segments"), col("n_dropped"))
      .orderBy("doc_id"),
    Some("""WITH d AS (SELECT doc_id,
                   string_split_regex(lower(text), '\s+') AS ws FROM documents),
            seg AS MATERIALIZED (
              SELECT doc_id, i AS pos,
                     array_to_string(ws[i*5+1 : i*5+5], ' ') AS seg
              FROM d, unnest(generate_series(0,
                     CAST(ceil(len(ws) / 5.0) AS BIGINT) - 1)) AS t(i)),
            heavy AS (SELECT seg FROM seg GROUP BY seg
                      HAVING count(DISTINCT doc_id) >= 3),
            kept AS (SELECT doc_id, pos, seg FROM seg
                     WHERE seg NOT IN (SELECT seg FROM heavy)),
            reb AS (SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
                           count(*) AS n_kept
                    FROM kept GROUP BY doc_id),
            tot AS (SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY doc_id)
            SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
                   CAST(t.n_segments AS BIGINT) AS n_segments,
                   CAST(t.n_segments - coalesce(r.n_kept, 0) AS BIGINT) AS n_dropped
            FROM tot t LEFT JOIN reb r USING (doc_id)
            ORDER BY doc_id"""))

  /** DuckDB CTE fragment recomputing MirrorMode SimHash fingerprints
    * value-for-value: per-occurrence word hash ([[TextDedup.strHash]]
    * spread by [[TextDedup.mirrorWordHash]]'s affine mask to 61 bits) →
    * per-bit majority vote (ties set the bit, Charikar's rule as
    * implemented by [[graft.functions.SimHashAgg]]) → OR-assembly. Bits
    * 61–63 are structurally zero on both engines. */
  private def mirrorSimhashCtes(src: String): String =
    s"""w AS (SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w
              FROM $src),
            wt AS MATERIALIZED (
              SELECT doc_id,
                     (list_reduce(
                        list_prepend(CAST(0 AS BIGINT),
                          list_transform(string_split(w, ''),
                            c -> CAST(unicode(c) AS BIGINT))),
                        (a, c) -> (a * 31 + c) % 1000000007)
                      * 2654435761 + 1000003)
                     & ((CAST(1 AS BIGINT) << 61) - 1) AS h
              FROM w),
            nw AS (SELECT doc_id, count(*) AS nw FROM wt GROUP BY doc_id),
            bits AS (
              SELECT doc_id, i,
                     sum(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE 0 END) AS c
              FROM wt, unnest(generate_series(0, 60)) AS t(i)
              GROUP BY doc_id, i),
            fp AS MATERIALIZED (
              SELECT b.doc_id,
                     CAST(sum(CASE WHEN 2 * c >= nw.nw
                          THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS fp
              FROM bits b JOIN nw USING (doc_id) GROUP BY b.doc_id)"""

  /** q195: MirrorMode SimHash fingerprints under a full value mirror —
    * every document's 64-bit fingerprint recomputed by DuckDB from the
    * word hashes up (q27 certifies the XxMode pipeline on containment
    * invariants; this row pins the majority-vote algebra bit-for-bit). */
  private val q195 = QDef(
    "q195_simhash_mirror_fp",
    (s, dir) => TextDedup.simhashAgg(Tables.load(s, dir, "documents"),
        "doc_id", "text", mode = TextDedup.MirrorMode)
      .select(col("id").as("doc_id"), col("fp"))
      .orderBy("doc_id"),
    Some(s"""WITH ${mirrorSimhashCtes("documents")}
            SELECT doc_id, fp FROM fp ORDER BY doc_id"""))

  /** q196: MirrorMode SimHash near-dup pairs — and the pigeonhole
    * blocking's recall-1 claim made a CONTRACT fact: Spark runs the
    * chunked [[TextDedup.simhashPairs]] (4×16-bit blocks, verify, dedup),
    * DuckDB brute-forces ALL pairs within Hamming distance 3 from the
    * recomputed fingerprints; the hashes match iff blocking+verify ≡
    * exhaustive search on this corpus. */
  private val q196 = QDef(
    "q196_simhash_mirror_pairs",
    (s, dir) => TextDedup.simhashPairs(Tables.load(s, dir, "documents"),
        "doc_id", "text", maxDist = 3, mode = TextDedup.MirrorMode)
      .select(col("id_l"), col("id_r"), col("hamming").cast("long").as("hamming"))
      .orderBy("id_l", "id_r"),
    Some(s"""WITH ${mirrorSimhashCtes("documents")}
            SELECT a.doc_id AS id_l, b.doc_id AS id_r,
                   CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
            FROM fp a JOIN fp b ON b.doc_id > a.doc_id
            WHERE bit_count(xor(a.fp, b.fp)) <= 3
            ORDER BY id_l, id_r"""))

  /** q197: the stream-stream FULL OUTER attribution join — q182 certifies
    * left-outer null extension (unmatched purchases); this row runs the
    * same two file-source streams through `joinType = "full_outer"`, so
    * the engine must ALSO null-extend every never-attributed click once
    * the purchase-side watermark proves no matching purchase can arrive
    * (the symmetric half of the outer-join state machine, exercised by no
    * other row). Unmatched clicks surface as the purchase_id IS NULL group
    * per user; the far-future sentinels (purchase -1 / click -2, disjoint
    * keys) force the terminal watermark flush of BOTH sides' held rows and
    * are themselves held back, so the terminal table is exactly the batch
    * full-outer twin — hash-checked against DuckDB's FULL JOIN. */
  private val q197 = QDef(
    "q197_stream_attribution_fullouter",
    (s, dir) => StreamSession(s) { ss =>
      val ev = Tables.load(ss, dir, "events")
      def side(tpe: String) = ev.where(col("event_type") === tpe)
        .select(col("user_id"), col("event_id").as("txn_id"), col("ts"))
      def sentinel(uid: Long) = ss.range(1).select(lit(uid).as("user_id"),
        lit(-1L).as("txn_id"),
        to_timestamp(lit("2099-01-01 00:00:00")).as("ts"))
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q197_").toString)
      def stage(tpe: String, sub: String, sentinelUid: Long): String = {
        val d = side(tpe)
        Staging.stageBatches(
          Seq(d.where(pmod(col("user_id"), lit(2)) === 0),
            d.where(pmod(col("user_id"), lit(2)) === 1),
            sentinel(sentinelUid)),
          s"$tmp/$sub", pinMtime = true)
      }
      val schema = sentinel(-1L).schema
      def readSide(inDir: String) = ss.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
      val joined = Streams.attributionJoin(
        readSide(stage("purchase", "p", -1L)),
        readSide(stage("click", "c", -2L)),
        within = "30 minutes", watermark = "1 hour", streaming = true,
        joinType = "full_outer")
      val sink = "q197_stream_sink"
      val q = joined.writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink)
        .where(col("user_id") >= 0L) // drop both sentinel keys (-1, -2)
        .groupBy(col("user_id"), col("purchase_id"))
        .agg(count(col("click_id")).as("n_clicks"),
          coalesce(max(col("click_id")), lit(-1L)).as("last_click_id"))
        .orderBy("user_id", "purchase_id") // Spark asc = NULLS FIRST
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS pms
                       FROM events WHERE event_type = 'purchase'),
                 c AS (SELECT user_id, event_id AS click_id, epoch_ms(ts) AS cms
                       FROM events WHERE event_type = 'click')
            SELECT coalesce(p.user_id, c.user_id) AS user_id, p.purchase_id,
                   CAST(count(c.click_id) AS BIGINT) AS n_clicks,
                   coalesce(max(c.click_id), -1) AS last_click_id
            FROM p FULL JOIN c
              ON p.user_id = c.user_id
             AND c.cms >= p.pms - 1800000 AND c.cms <= p.pms
            GROUP BY 1, 2
            ORDER BY user_id, purchase_id NULLS FIRST"""))

  /** q198: q171's sessionization on Spark 4's `transformWithState` API
    * ([[Streams.sessionizeStreamTws]] — ValueState + explicit event-time
    * timers, the successor to flatMapGroupsWithState) under the SAME batch
    * oracle, on the RocksDB provider transformWithState requires. The two
    * state APIs differ exactly where bugs would live — timer re-arming on
    * session extension, stale-timer suppression when an extension and the
    * old horizon land in one batch, ValueState lifecycle vs GroupState
    * timeouts — and the shared hash makes their equivalence a contract
    * fact, not a code-review claim. */
  private val q198 = QDef(
    "q198_stream_sessionize_tws",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      sessionizeContract(ss, dir, "q198_stream_sink", tws = true)
    },
    q171.oracle)

  /** Shared contract body for the streaming anomaly rows: events staged as
    * three TIME-ORDERED calendar batches (state — each user's rolling
    * value history — must carry across micro-batches; in-order arrival
    * makes the stream's emissions exactly the batch operator's rows, the
    * StreamsSpec-proven equivalence), scored incrementally, read back
    * sorted. No watermark: the operator is keyed on arrival order, not
    * event-time windows (NoTimeout/TimeMode.None state lifecycle). */
  private def anomalyContract(ss: SparkSession, dir: String, sink: String,
      tws: Boolean): DataFrame = {
    import ss.implicits._
    val ev0 = Tables.load(ss, dir, "events")
    val tmp = TmpReaper.register(
      java.nio.file.Files.createTempDirectory(sink + "_").toString)
    def before(d: String) = col("ts") < to_timestamp(lit(d))
    val inDir = Staging.stageBatches(
      Seq(ev0.where(before("2024-01-11 00:00:00")),
        ev0.where(!before("2024-01-11 00:00:00") &&
          before("2024-01-21 00:00:00")),
        ev0.where(!before("2024-01-21 00:00:00"))),
      tmp, pinMtime = true)
    val ev = ss.readStream.schema(ev0.schema)
      .option("maxFilesPerTrigger", "1").parquet(inDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[Streams.ValueEvent]
    val scored = if (tws) Streams.anomalyStreamTws(ev) else Streams.anomalyStream(ev)
    val q = scored.toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    ss.table(sink).orderBy("user_id", "event_id")
  }

  /** q199: the streaming rolling z-score anomaly detector
    * ([[Streams.anomalyStream]] — the last spec-only streaming operator
    * family) through the REAL micro-batch engine under q114's batch
    * oracle: per-user rolling ≤16-value history as flatMapGroupsWithState
    * state, carried across three time-ordered micro-batches; any
    * divergence in the fold, the ordering, or the state carry
    * hash-fails. */
  private val q199 = QDef(
    "q199_stream_anomaly",
    (s, dir) => StreamSession(s) { ss =>
      anomalyContract(ss, dir, "q199_stream_sink", tws = false)
    },
    AnalyticsQueries.anomalyOracle)

  /** q200: q199 on `transformWithState` with LIST state
    * ([[Streams.AnomalyProcessor]] — ValueState is q198, this row
    * certifies the `ListState` primitive: O(1) appends on the fill path,
    * truncating rewrite when values roll off) under the SAME oracle, on
    * the RocksDB provider the API requires. */
  private val q200 = QDef(
    "q200_stream_anomaly_tws",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      anomalyContract(ss, dir, "q200_stream_sink", tws = true)
    },
    AnalyticsQueries.anomalyOracle)

  /** q201: q183's windowed heavy hitters on `transformWithState` with MAP
    * state ([[Streams.HeavyHittersProcessor]] — Misra–Gries counters in a
    * `MapState[String, Long]` per window, plus a ValueState emission
    * version; with q198/q200 this certifies ALL THREE TWS state
    * primitives). The read-back selects each window's FINAL sketch (max
    * emission version — append-mode's equivalent of q183's complete-mode
    * table) and gates it with the SAME guaranteed-heavy containment
    * oracle: an MG merge that dropped a guaranteed item shrinks the
    * semi-join and hash-fails. */
  private val q201 = QDef(
    "q201_stream_heavy_hitters_tws",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val k = 2
      val ev0 = Tables.load(ss, dir, "events")
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q201_").toString)
      val inDir = Staging.stageBatches(
        (0 until 3).map(i => ev0.where(pmod(col("event_id"), lit(3)) === i)), tmp)
      val sink = "q201_stream_sink"
      val q = Streams.heavyHittersStreamTws(
          ss.readStream.schema(ev0.schema)
            .option("maxFilesPerTrigger", "1").parquet(inDir), k)
        .toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val byWindow = org.apache.spark.sql.expressions.Window.partitionBy("start_ms")
      val finalSketch = ss.table(sink)
        .withColumn("__mv", max("ver").over(byWindow))
        .where(col("ver") === col("__mv"))
        .select("start_ms", "item")
      val exact = ev0
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(unix_millis(col("w.start")).as("start_ms"),
          col("event_type").as("item"), col("cnt"))
      val tot = exact.groupBy("start_ms").agg(sum(col("cnt")).as("__n"))
      exact.join(tot, "start_ms")
        .where(col("cnt") * (k + 1) > col("__n"))
        .join(finalSketch, Seq("start_ms", "item"), "left_semi")
        .select(col("start_ms"), col("item"), col("cnt"))
        .orderBy("start_ms", "item")
    },
    q183.oracle)

  /** q202: the STATE-MIGRATION path — sessionization warm-started from a
    * batch snapshot via transformWithState INITIAL STATE
    * ([[Streams.SessionMigrationProcessor]]): the legacy half (< Jan 21)
    * is sessionized in BATCH, every user's last (open) session becomes an
    * initial-state seed with its closure timer, already-closed legacy
    * sessions go straight to output, and the live half streams through
    * the seeded processor — a session straddling the migration cut must
    * MERGE batch-side counts with stream-side events, and a seed nothing
    * extends must still flush by terminal-watermark timer. The union is
    * checked against q171's WHOLE-TABLE oracle, so the migration is
    * certified lossless end-to-end: dropped seeds, double-counted
    * straddlers, or timer-less seeds all hash-fail. This is the
    * fMGWS-checkpoint → TWS (or batch backfill → streaming) upgrade path
    * a real deployment needs. */
  private val q202 = QDef(
    "q202_stream_sessionize_migration",
    (s, dir) => StreamSession(s) { ss =>
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      import ss.implicits._
      val gapMs = 30 * 60 * 1000L
      val ev0 = Tables.load(ss, dir, "events")
      def at(d: String) = to_timestamp(lit(d))
      val legacy = ev0.where(col("ts") < at("2024-01-21 00:00:00"))
      val live = ev0.where(col("ts") >= at("2024-01-21 00:00:00"))
      val byUser = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      val tagged = Streams.sessionizeBatch(legacy, gapMs)
        .withColumn("__mx", max("start_ms").over(byUser))
      val closed = tagged.where(col("start_ms") < col("__mx"))
        .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
        .localCheckpoint() // consumed after the stream; keep it plan-free
      val seeds = tagged.where(col("start_ms") === col("__mx"))
        .select(col("user_id"), col("start_ms").as("startMs"),
          col("end_ms").as("endMs"), col("n_events").as("n"))
        .as[Streams.SessionSeed]
      val tmp = TmpReaper.register(
        java.nio.file.Files.createTempDirectory("q202_").toString)
      val inDir = Staging.stageBatches(
        Seq(live.where(col("ts") < at("2024-01-26 00:00:00")),
          live.where(col("ts") >= at("2024-01-26 00:00:00"))),
        tmp, pinMtime = true)
      val ev = ss.readStream.schema(ev0.schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir)
        .select(col("user_id"), col("ts")).as[Streams.SessionEvent]
      val sink = "q202_stream_sink"
      val q = Streams.sessionizeStreamTwsMigrated(ev, gapMs, seeds,
          watermarkDelay = "0 seconds")
        .toDF().writeStream.format("memory").queryName(sink)
        .outputMode("append")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      ss.table(sink).unionByName(closed).orderBy("user_id", "start_ms")
    },
    q171.oracle)

  val all: Seq[QDef] = Seq(
    q24, q25, q26, q27, q28, q29, q30, q31, q32, q33, q34, q35, q36, q37,
    q38, q40, q41, q49, q61, q62, q70, q71, q73, q74, q88, q89, q90, q91,
    q92, q93, q94, q95, q96, q97, q98, q100, q101, q102, q103, q104, q105,
    q133, q142, q148, q159, q163, q166, q168, q171, q173, q174, q175, q179,
    q181, q182, q183, q184, q185, q187, q188, q189, q190, q191, q193,
    q194, q195, q196, q197, q198, q199, q200, q201, q202)
}
