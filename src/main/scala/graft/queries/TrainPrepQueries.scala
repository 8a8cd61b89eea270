package graft.queries

import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.ext.{Packing, Sampling, TextAnalysis}

/** Training-data preparation coverage (north-star extensions beyond the
  * reference surface): deterministic splitting/sampling, token-budget
  * sequence packing, Gopher-style repetition filtering, and corpus-wide
  * heavy-hitter n-grams — the curation steps between a cleaned corpus and
  * example serialization. All registered with full DuckDB oracles (the
  * operators deliberately use the SQL-mirrorable [[Sampling.arithHash]];
  * xxhash64 variants are spec-tested instead).
  */
object TrainPrepQueries {

  /** q51: stable train/val/test assignment — 80/10/10 by hash bucket.
    * Adding documents never moves existing ones between splits (the
    * reproducibility property `randomSplit` cannot give). */
  private val q51 = QDef(
    "q51_hash_split",
    (s, dir) => Sampling
      .hashSplit(Tables.load(s, dir, "documents"), "doc_id", seed = 7)
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id"),
    Some("""SELECT doc_id,
                   ((doc_id % 1000003 + 7) * 2654435761) % 1000000007 % 100 AS bucket,
                   CASE WHEN ((doc_id % 1000003 + 7) * 2654435761) % 1000000007 % 100 < 80 THEN 'train'
                        WHEN ((doc_id % 1000003 + 7) * 2654435761) % 1000000007 % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents ORDER BY doc_id"""))

  /** q52: token-budget sequence packing (500-token packs, 8 shards),
    * reported as the per-pack summary. The running sum is windowed per
    * shard — shard-parallel, never a global single-partition window. */
  private val q52 = QDef(
    "q52_seq_packing",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val packed = Packing.packByBudget(docs, "doc_id",
        TextAnalysis.wordCount(col("text")), budget = 500L, nShards = 8)
      Packing.packSummary(packed, "doc_id").orderBy("shard", "pack_id")
    },
    Some("""WITH t AS (
              SELECT doc_id, doc_id % 8 AS shard,
                     CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS tokens
              FROM documents),
            c AS (
              SELECT *, sum(tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS cum
              FROM t),
            p AS (
              SELECT *, shard * 1000000000 +
                        CAST(floor((cum - tokens) / 500) AS BIGINT) AS pack_id
              FROM c)
            SELECT shard, pack_id,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS total_tokens,
                   min(doc_id) AS first_id, max(doc_id) AS last_id
            FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id"""))

  /** q53: Gopher repetition metrics per document (top-word, top-bigram and
    * duplicate-5-gram fractions + the published-threshold flag). Integer
    * ratio arithmetic — bit-identical across engines. */
  private val q53 = QDef(
    "q53_repetition",
    (s, dir) => TextAnalysis
      .repetitionMetrics(Tables.load(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id"),
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            u1 AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
            ua AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                          CAST(max(c) AS DOUBLE) / sum(c) AS top_word_fraction
                   FROM u1 GROUP BY doc_id),
            b0 AS (SELECT a.doc_id, a.w || ' ' || b.w AS sh
                   FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            b1 AS (SELECT doc_id, sh, count(*) AS c FROM b0 GROUP BY doc_id, sh),
            ba AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                          CAST(max(c) AS DOUBLE) / sum(c) AS top_bigram_fraction
                   FROM b1 GROUP BY doc_id),
            s0 AS (SELECT a.doc_id,
                          a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
                   FROM w a
                   JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                   JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                   JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
                   JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sa AS (SELECT doc_id,
                          CAST(count(*) - count(DISTINCT sh) AS DOUBLE) / count(*)
                            AS dup_5gram_fraction
                   FROM s0 GROUP BY doc_id)
            SELECT d.doc_id,
                   coalesce(ua.n_words, 0) AS n_words,
                   coalesce(ua.top_word_fraction, 0.0) AS top_word_fraction,
                   coalesce(ba.n_bigrams, 0) AS n_bigrams,
                   coalesce(ba.top_bigram_fraction, 0.0) AS top_bigram_fraction,
                   coalesce(sa.dup_5gram_fraction, 0.0) AS dup_5gram_fraction,
                   coalesce(ua.top_word_fraction, 0.0) > 0.2
                     OR coalesce(ba.top_bigram_fraction, 0.0) > 0.18
                     OR coalesce(sa.dup_5gram_fraction, 0.0) > 0.3 AS repetitious
            FROM documents d
            LEFT JOIN ua ON d.doc_id = ua.doc_id
            LEFT JOIN ba ON d.doc_id = ba.doc_id
            LEFT JOIN sa ON d.doc_id = sa.doc_id
            ORDER BY d.doc_id"""))

  /** q54: corpus-wide top-20 bigrams with occurrence + document-frequency
    * counts — the exact heavy-hitter baseline (total tie-break order makes
    * the limit deterministic). */
  private val q54 = QDef(
    "q54_heavy_ngrams",
    (s, dir) => TextAnalysis
      .heavyHitterNgrams(Tables.load(s, dir, "documents"), "doc_id", "text",
        n = 2, k = 20)
      .orderBy("rank"),
    Some("""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\s+'), 1) AS pos
              FROM documents),
            b AS (SELECT a.doc_id, a.w || ' ' || b.w AS sh
                  FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            g AS (SELECT sh AS ngram,
                         CAST(count(*) AS BIGINT) AS n_occurrences,
                         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
                  FROM b GROUP BY sh),
            r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, ngram)
                         AS rank
                  FROM g)
            SELECT ngram, n_occurrences, n_docs, CAST(rank AS BIGINT) AS rank
            FROM r WHERE rank <= 20 ORDER BY rank"""))

  /** q55: deterministic stratified sampling by language — per-stratum keep
    * quotas applied by hash bucket, `sampleBy` semantics with zero RNG. */
  private val q55 = QDef(
    "q55_stratified_sample",
    (s, dir) => Sampling
      .stratifiedSample(Tables.load(s, dir, "documents"), "doc_id", "lang",
        quotas = Map("en" -> 60, "es" -> 30, "fr" -> 15, "de" -> 5, "zh" -> 25),
        seed = 11)
      .select(col("doc_id"), col("lang"),
        pmod(Sampling.arithHash(col("doc_id"), 11), lit(100L)).as("bucket"))
      .orderBy("doc_id"),
    Some("""WITH b AS (
              SELECT doc_id, lang,
                     ((doc_id % 1000003 + 11) * 2654435761) % 1000000007 % 100 AS bucket
              FROM documents)
            SELECT doc_id, lang, bucket
            FROM b
            WHERE bucket < CASE lang WHEN 'en' THEN 60 WHEN 'es' THEN 30
                                     WHEN 'fr' THEN 15 WHEN 'de' THEN 5
                                     WHEN 'zh' THEN 25 ELSE 0 END
            ORDER BY doc_id"""))

  /** q56: PII redaction over documents with deterministically planted PII
    * (the corpus itself is synthetic and PII-free, so emails/phones/IPs are
    * appended as functions of the doc id — both engines build and then
    * scrub the identical string; the shared regex subset guarantees
    * bit-identical redaction). */
  private val q56 = QDef(
    "q56_pii_redaction",
    (s, dir) => {
      val planted = Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          concat(
            substring(col("text"), 1, 40),
            lit(" contact u"), col("doc_id"), lit("@mail-"), col("doc_id"),
            lit(".example.com or call +1 555 010"), col("doc_id"),
            lit(" from 10.0."), pmod(col("doc_id"), lit(256L)), lit(".7 today"))
            .as("dirty"))
      planted.select(
          col("doc_id"),
          TextAnalysis.redactPii(col("dirty")).as("redacted"),
          regexp_count(col("dirty"), lit(TextAnalysis.EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("dirty"), lit(TextAnalysis.Ipv4Re)).cast("long").as("n_ips"))
        .orderBy("doc_id")
    },
    Some("""WITH p AS (
              SELECT doc_id,
                     substring(text, 1, 40) || ' contact u' || doc_id || '@mail-'
                       || doc_id || '.example.com or call +1 555 010' || doc_id
                       || ' from 10.0.' || (doc_id % 256) || '.7 today' AS dirty
              FROM documents)
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(dirty,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                     '\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS redacted,
                   CAST(len(regexp_extract_all(dirty,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(dirty,
                     '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ips
            FROM p ORDER BY doc_id"""))

  /** q57: the end-to-end curation pipeline (the Dolma/FineWeb shape):
    * language ID → quality score → repetition filter → exact dedup →
    * stable split, reported as corpus accounting per (split, language,
    * kept) with document and token totals — the summary a data team reads
    * before a training run. Every stage is an already-oracle-checked
    * operator (q31/q32/q53/q24/q51); this query proves they compose in one
    * plan: per-doc aggregations and one text-keyed window, no corpus-global
    * step anywhere. */
  private val q57 = QDef(
    "q57_curation_pipeline",
    (s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val base = Sampling.hashSplit(docs, "doc_id", seed = 7)
        .withColumn("lang_pred", TextAnalysis.langId(col("text")))
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .withColumn("tokens", TextAnalysis.wordCount(col("text")))
      val dup = graft.ext.TextDedup.exactCanonical(docs, "doc_id", "text")
        .select(col("doc_id"), col("is_duplicate"))
      val rep = TextAnalysis.repetitionMetrics(docs, "doc_id", "text")
        .select(col("doc_id"), col("repetitious"))
      base.join(dup, "doc_id").join(rep, "doc_id")
        .withColumn("kept",
          !col("is_duplicate") && !col("repetitious") &&
            col("quality") >= 0.5 && col("lang_pred") =!= "und")
        .groupBy(col("split"), col("lang_pred"), col("kept"))
        .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("n_tokens"))
        .orderBy("split", "lang_pred", "kept")
    },
    Some(s"""WITH w AS (
              SELECT doc_id,
                     unnest(string_split_regex(lower(text), '\\s+')) AS w,
                     generate_subscripts(string_split_regex(lower(text), '\\s+'), 1) AS pos
              FROM documents),
            sc AS (
              SELECT doc_id,
                     count(CASE WHEN w IN ('the','a','of','and','to','in','is') THEN 1 END) AS en,
                     count(CASE WHEN w IN ('el','la','de','y','que','en') THEN 1 END) AS es,
                     count(CASE WHEN w IN ('le','la','de','et','les','des') THEN 1 END) AS fr,
                     count(CASE WHEN w IN ('der','die','das','und','ist','von') THEN 1 END) AS de
              FROM w GROUP BY doc_id),
            lp AS (
              SELECT doc_id,
                     CASE WHEN greatest(en, es, fr, de) = 0 THEN 'und'
                          WHEN en = greatest(en, es, fr, de) THEN 'en'
                          WHEN es = greatest(en, es, fr, de) THEN 'es'
                          WHEN fr = greatest(en, es, fr, de) THEN 'fr'
                          ELSE 'de' END AS lang_pred
              FROM sc),
            u1 AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY doc_id, w),
            ua AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS twf FROM u1 GROUP BY doc_id),
            b0 AS (SELECT a.doc_id, a.w || ' ' || b.w AS sh
                   FROM w a JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
            b1 AS (SELECT doc_id, sh, count(*) AS c FROM b0 GROUP BY doc_id, sh),
            ba AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS tbf FROM b1 GROUP BY doc_id),
            s0 AS (SELECT a.doc_id,
                          a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w AS sh
                   FROM w a
                   JOIN w b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
                   JOIN w c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
                   JOIN w d ON d.doc_id = a.doc_id AND d.pos = a.pos + 3
                   JOIN w e ON e.doc_id = a.doc_id AND e.pos = a.pos + 4),
            sa AS (SELECT doc_id,
                          CAST(count(*) - count(DISTINCT sh) AS DOUBLE) / count(*) AS d5f
                   FROM s0 GROUP BY doc_id),
            per AS (
              SELECT d.doc_id,
                     ((d.doc_id % 1000003 + 7) * 2654435761) % 1000000007 % 100 AS bucket,
                     length(d.text) AS n_chars,
                     CAST(len(string_split_regex(lower(d.text), '\\s+')) AS BIGINT) AS tokens,
                     CAST(len(list_distinct(string_split_regex(lower(d.text), '\\s+'))) AS DOUBLE)
                       / len(string_split_regex(lower(d.text), '\\s+')) AS distinct_ratio,
                     d.doc_id <> min(d.doc_id) OVER (PARTITION BY d.text) AS is_duplicate,
                     lp.lang_pred,
                     coalesce(ua.twf, 0.0) > 0.2 OR coalesce(ba.tbf, 0.0) > 0.18
                       OR coalesce(sa.d5f, 0.0) > 0.3 AS repetitious
              FROM documents d
              JOIN lp ON d.doc_id = lp.doc_id
              LEFT JOIN ua ON d.doc_id = ua.doc_id
              LEFT JOIN ba ON d.doc_id = ba.doc_id
              LEFT JOIN sa ON d.doc_id = sa.doc_id),
            fin AS (
              SELECT CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
                     lang_pred,
                     NOT is_duplicate AND NOT repetitious
                       AND least(CAST(n_chars AS DOUBLE) / 400.0, 1.0) * 0.5
                           + distinct_ratio * 0.5 >= 0.5
                       AND lang_pred <> 'und' AS kept,
                     tokens
              FROM per)
            SELECT split, lang_pred, kept,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(tokens) AS BIGINT) AS n_tokens
            FROM fin GROUP BY split, lang_pred, kept
            ORDER BY split, lang_pred, kept"""))

  /** q79: overlapping token-window chunking
    * ([[TextAnalysis.chunkDocuments]]) — the sharding step before
    * embedding in a retrieval pipeline. 64-token windows, 8-token
    * overlap; word-aligned so both engines rebuild identical chunk
    * strings. Shuffle-free (projection + in-row explode). */
  private val q79 = QDef(
    "q79_chunking",
    (s, dir) => TextAnalysis
      .chunkDocuments(Tables.load(s, dir, "documents"), "doc_id", "text",
        size = 64, overlap = 8)
      .orderBy("doc_id", "chunk_id"),
    Some("""WITH t AS (
              SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
              FROM documents),
            n AS (SELECT doc_id, toks,
                         greatest(1, CAST(ceil((len(toks) - 8) / 56.0) AS BIGINT)) AS nc
                  FROM t),
            e AS (SELECT doc_id, toks, unnest(range(nc)) AS i FROM n)
            SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
                   array_to_string(toks[i*56+1 : i*56+64], ' ') AS chunk_text,
                   CAST(least(len(toks) - i*56, 64) AS BIGINT) AS n_tokens
            FROM e ORDER BY doc_id, chunk_id"""))

  /** q80: domain-mixture weights ([[TextAnalysis.mixtureWeights]]) — per
    * source, exact doc/token counts and the α=0.5 temperature weight
    * sqrt(tokens) (IEEE-correctly-rounded, so bit-deterministic; the
    * normalized share is a spec concern because summing irrational
    * doubles is order-dependent). */
  private val q80 = QDef(
    "q80_mixture_weights",
    (s, dir) => TextAnalysis
      .mixtureWeights(Tables.load(s, dir, "documents"), "source", "text")
      .orderBy("domain"),
    Some("""SELECT source AS domain,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS n_tokens,
                   sqrt(CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS DOUBLE)) AS alpha_half_weight
            FROM documents GROUP BY source ORDER BY domain"""))

  /** q87: fixed-size per-domain sample ([[Sampling.groupSample]]) — five
    * documents per source, chosen by seeded hash rank (reservoir semantics
    * without RNG): identical selection on every run, engine, and
    * partitioning. The oracle mirrors the arithHash ranking exactly. */
  private val q87 = QDef(
    "q87_group_sample",
    (s, dir) => Sampling
      .groupSample(Tables.load(s, dir, "documents"), "doc_id", "source",
        k = 5, seed = 11)
      .select(col("source"), col("sample_rank"), col("doc_id"))
      .orderBy("source", "sample_rank"),
    Some("""SELECT source, CAST(rn AS BIGINT) AS sample_rank, doc_id
            FROM (
              SELECT source, doc_id,
                     row_number() OVER (PARTITION BY source ORDER BY
                       ((doc_id % 1000003 + 11) * 2654435761) % 1000000007,
                       doc_id) AS rn
              FROM documents)
            WHERE rn <= 5
            ORDER BY source, sample_rank"""))

  /** q99: temperature-mixture resampling
    * ([[TextAnalysis.temperatureResample]]) — q80's weights applied as an
    * actual corpus expansion. Multipliers are integer-milli from exact
    * token counts (`sqrt(T_max/t_d)` — no cross-domain double sum, the
    * q80 order-dependence caveat), fractional copies resolved by the
    * mirrorable arithHash, so the oracle replicates every copy row. */
  private val q99 = QDef(
    "q99_mixture_resample",
    (s, dir) => TextAnalysis
      .temperatureResample(Tables.load(s, dir, "documents"), "doc_id",
        "source", "text", seed = 7)
      .orderBy("doc_id", "copy"),
    Some("""WITH d AS (
              SELECT source AS domain,
                     CAST(sum(len(string_split_regex(lower(text), '\s+'))) AS BIGINT) AS t
              FROM documents GROUP BY source),
            m AS (
              SELECT domain,
                     CAST(floor(sqrt(CAST((SELECT max(t) FROM d) AS DOUBLE)
                                     / CAST(t AS DOUBLE)) * 1000) AS BIGINT) AS mm
              FROM d),
            c AS (
              SELECT doc_id, m.domain, mm,
                     (mm // 1000) + CASE
                       WHEN ((doc_id % 1000003 + 7) * 2654435761) % 1000000007 % 1000
                            < mm % 1000 THEN 1 ELSE 0 END AS n_copies
              FROM documents JOIN m ON m.domain = documents.source)
            SELECT doc_id, domain,
                   CAST(unnest(generate_series(1, n_copies)) AS BIGINT) AS copy,
                   CAST(n_copies AS BIGINT) AS n_copies
            FROM c WHERE n_copies >= 1
            ORDER BY doc_id, copy"""))

  /** q170: LEAKAGE-SAFE train/val/test split — the q51 hash split keyed on
    * the exact-dedup CLUSTER id instead of the row id, so every copy of a
    * duplicated document lands in the same split (row-keyed splitting puts
    * one copy in train and another in test — the eval-contamination bug
    * dedup-then-split pipelines exist to prevent). Query-level composition
    * of [[graft.ext.TextDedup.exactCanonical]] (canonical_id = min doc_id
    * per identical text) and [[Sampling.hashSplit]] on canonical_id; any
    * cluster relation (MinHash clusters, semantic clusters) slots into the
    * same shape. Split purity per cluster is structural — bucket is a pure
    * function of canonical_id — not an after-the-fact check. */
  private val q170 = QDef(
    "q170_leakage_safe_split",
    (s, dir) => {
      val canon = graft.ext.TextDedup
        .exactCanonical(Tables.load(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("canonical_id"))
      Sampling.hashSplit(canon, "canonical_id", seed = 7)
        .select(col("doc_id"), col("canonical_id"), col("bucket"),
          col("split"))
        .orderBy("doc_id")
    },
    Some("""WITH c AS (SELECT doc_id,
                              min(doc_id) OVER (PARTITION BY text)
                                AS canonical_id
                       FROM documents)
            SELECT doc_id, canonical_id,
                   ((canonical_id % 1000003 + 7) * 2654435761)
                     % 1000000007 % 100 AS bucket,
                   CASE WHEN ((canonical_id % 1000003 + 7) * 2654435761)
                             % 1000000007 % 100 < 80 THEN 'train'
                        WHEN ((canonical_id % 1000003 + 7) * 2654435761)
                             % 1000000007 % 100 < 90 THEN 'val'
                        ELSE 'test' END AS split
            FROM c ORDER BY doc_id"""))

  val all: Seq[QDef] =
    Seq(q51, q52, q53, q54, q55, q56, q57, q79, q80, q87, q99, q170)
}
