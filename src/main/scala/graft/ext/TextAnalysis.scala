package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: n-gram-free language ID
  * (stopword voting), quality scoring, token counting, a rolling-hash
  * document fingerprint, and Gopher-style repetition metrics. The scalar
  * operators are pure codegen'd shuffle-free expressions; everything is
  * expressible in ANSI SQL for the DuckDB oracle.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Tiny built-in stopword lists; enough signal for a coarse heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"))

  private def hits(toks: Column, lang: String): Column =
    size(filter(toks, w => w.isin(stopwords(lang).map(x => x: Any): _*)))

  /** Predicted language = argmax of stopword hits with fixed precedence
    * (en > es > fr > de > und) — deterministic on ties, 'und' when nothing
    * matches. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val (en, es, fr, de) = (hits(t, "en"), hits(t, "es"), hits(t, "fr"), hits(t, "de"))
    val best = greatest(en, es, fr, de)
    when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(es === best, lit("es"))
      .when(fr === best, lit("fr"))
      .otherwise(lit("de"))
  }

  def wordCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Tokens under a BPE-ish lexer regex: letter runs, digit runs, or single
    * non-alphanumeric symbols. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  def distinctWordRatio(text: Column): Column =
    size(array_distinct(tokens(text))).cast("double") / size(tokens(text))

  def meanWordLength(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) => acc + length(w)).cast("double") /
      size(tokens(text))

  /** Quality score in [0,1]: shortness penalty + repetition penalty — the
    * shape of corpus-quality filters (length/stopword-ratio heuristics). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 400.0, lit(1.0))
    val diversity = distinctWordRatio(text)
    lenScore * 0.5 + diversity * 0.5
  }

  /** Rolling polynomial fingerprint over per-word codes, mod 1e9+7 — stays
    * in BIGINT range (no ANSI overflow), same left fold on both engines. */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), w => (ascii(w) * 7 + length(w)).cast("long")),
      lit(0L),
      (acc, c) => (acc * 31 + c) % 1000000007L)

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1, public): the
    * fraction of tokens taken by the most frequent word, by the most
    * frequent bigram, and the fraction of 5-gram occurrences that are
    * repeats — the standard "document is degenerate boilerplate" filters a
    * corpus-curation pipeline applies before training.
    *
    * Scale shape: three per-document hash aggregations over exploded
    * tokens/shingles (map-side partial aggregation applies; nothing is ever
    * corpus-global), joined back on the document id. All ratios are
    * integer/integer divisions — exact on any engine. Documents too short
    * to form an n-gram get fraction 0. The `repetitious` flag applies
    * Gopher's published thresholds (0.2 / 0.18 / 0.30). */
  def repetitionMetrics(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ids = df.select(col(idCol).as("id"))
    def topFraction(n: Int, outTotal: String, outFrac: String): DataFrame =
      TextDedup.shingleRowsAll(df, idCol, textCol, n)
        .groupBy(col("id"), col("sh")).agg(count(lit(1)).as("tf"))
        .groupBy(col("id"))
        .agg(sum(col("tf")).as(outTotal), max(col("tf")).as("__top"))
        .withColumn(outFrac, col("__top").cast("double") / col(outTotal))
        .drop("__top")
    val dup5 = TextDedup.shingleRowsAll(df, idCol, textCol, 5)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__n5"), countDistinct(col("sh")).as("__d5"))
      .withColumn("dup_5gram_fraction",
        (col("__n5") - col("__d5")).cast("double") / col("__n5"))
      .select(col("id"), col("dup_5gram_fraction"))
    ids
      .join(topFraction(1, "n_words", "top_word_fraction"), Seq("id"), "left_outer")
      .join(topFraction(2, "n_bigrams", "top_bigram_fraction"), Seq("id"), "left_outer")
      .join(dup5, Seq("id"), "left_outer")
      .select(
        col("id").as(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("top_word_fraction"), lit(0.0)).as("top_word_fraction"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("top_bigram_fraction"), lit(0.0)).as("top_bigram_fraction"),
        coalesce(col("dup_5gram_fraction"), lit(0.0)).as("dup_5gram_fraction"))
      .withColumn("repetitious",
        col("top_word_fraction") > 0.2 ||
          col("top_bigram_fraction") > 0.18 ||
          col("dup_5gram_fraction") > 0.3)
  }

  /** Conservative PII patterns shared by the redaction operator and its
    * oracle — the syntax subset (character classes, bounded repeats, \b)
    * that Java regex and RE2 interpret identically, so redaction is
    * bit-reproducible across engines. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\+?[0-9][0-9 -]{7,}[0-9]"

  /** PII redaction (emails, then IPv4s, then phone-like digit runs — the
    * order matters: an email's local part may contain digits) — the
    * scrubbing pass a corpus runs before training. Pure codegen'd
    * regexp_replace chain: shuffle-free, linear, pushdown-friendly. */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailRe, "<EMAIL>")
    val noIp = regexp_replace(noEmail, Ipv4Re, "<IP>")
    regexp_replace(noIp, PhoneRe, "<PHONE>")
  }

  /** Corpus-wide heavy-hitter n-grams: occurrence and document-frequency
    * counts per n-gram, top `k` by occurrences (ties broken by the n-gram
    * string — a total order, so `limit` is deterministic). One shuffle on
    * the n-gram with map-side combine, then a top-k sort — the exact
    * baseline a Misra–Gries/count-min sketch approximates at 100 TB. */
  def heavyHitterNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(desc("n_occurrences"), asc("ngram"))
    TextDedup.shingleRowsAll(df, idCol, textCol, n)
      .groupBy(col("sh").as("ngram"))
      .agg(count(lit(1)).as("n_occurrences"), countDistinct(col("id")).as("n_docs"))
      .orderBy(desc("n_occurrences"), asc("ngram"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Split documents into fixed-size overlapping token windows — the
    * chunking step feeding an embedding/retrieval pipeline (every RAG and
    * long-document pipeline shards text before embedding). Pure
    * projection + `posexplode` over an in-row `sequence`: no shuffle, no
    * UDF; chunk boundaries are word-aligned so the output is exactly
    * reproducible from the tokenization.
    *
    * Chunk i covers tokens [i*(size-overlap), i*(size-overlap)+size); the
    * last chunk may be shorter; documents shorter than `size` yield one
    * chunk. */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need 0 <= overlap < size")
    val stride = size - overlap
    val toks = tokens(col(textCol))
    val nChunks = greatest(lit(1L),
      ceil((org.apache.spark.sql.functions.size(toks).cast("double") - overlap) / stride).cast("long"))
    df.select(col(idCol).as("doc_id"), toks.as("__toks"), nChunks.as("__nc"))
      .select(col("doc_id"), col("__toks"),
        posexplode(sequence(lit(0L), col("__nc") - 1)).as(Seq("chunk_id", "__i")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(slice(col("__toks"),
          (col("__i") * stride + 1).cast("int"), lit(size)), " ").as("chunk_text"),
        least(org.apache.spark.sql.functions.size(col("__toks")) - col("__i") * stride,
          lit(size)).cast("long").as("n_tokens"))
  }

  /** Domain-mixture weighting — the data-recipe step that balances
    * training sources: per domain, the token count and the
    * temperature-scaled sampling weight `sqrt(tokens)` (the α = 0.5
    * mixture rule; sqrt is IEEE-correctly-rounded, so the weight is
    * bit-deterministic, unlike a general pow). Normalized shares are a
    * ratio of these weights — left to the caller/spec because a sum of
    * irrational doubles is shuffle-order-dependent. One aggregate over
    * the corpus: domains × 1 rows out, corpus-size-independent. */
  def mixtureWeights(df: DataFrame, domainCol: String, textCol: String): DataFrame =
    df.select(col(domainCol).as("domain"), wordCount(col(textCol)).as("__t"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
      .select(col("domain"), col("n_docs"), col("n_tokens"),
        sqrt(col("n_tokens").cast("double")).as("alpha_half_weight"))

  /** Apply the α=0.5 temperature mixture as an actual corpus resample —
    * the step after [[mixtureWeights]] in a training pipeline: each
    * document is replicated `multiplier(domain)` times (fractional parts
    * resolved per-document by seeded hash, RNG-free and
    * partitioning-invariant), producing the epoch-expanded corpus.
    *
    * The multiplier is `sqrt(T_max / t_d)` (largest domain keeps 1.0,
    * smaller domains upsampled by the square root of the token-count
    * ratio — √-temperature toward balance), computed in integer
    * milli-units from EXACT integer token counts. Deliberately NOT the
    * normalized-share formula: that needs a cross-domain sum of
    * irrational doubles, which is shuffle-order-dependent (the q80
    * caveat); `max` over integers is exact, and the remaining scalar
    * chain (one division, one sqrt, one floor) is identical IEEE on any
    * engine. The fractional copy uses [[Sampling.arithHash]], so adding
    * documents later never flips an existing document's copy count.
    *
    * Scale shape: one token aggregate per domain (tiny), broadcast back,
    * one in-row `sequence` explode — no corpus shuffle at all. */
  def temperatureResample(df: DataFrame, idCol: String, domainCol: String,
      textCol: String, seed: Long): DataFrame = {
    val toks = mixtureWeights(df, domainCol, textCol)
      .select(col("domain"), col("n_tokens"))
    val tmax = toks.agg(max("n_tokens").as("__tmax"))
    val mult = toks.crossJoin(broadcast(tmax))
      .select(col("domain"),
        floor(sqrt(col("__tmax").cast("double") / col("n_tokens").cast("double"))
          * 1000).cast("long").as("multiplier_milli"))
    df.select(col(idCol).as("id"), col(domainCol).as("domain"))
      .join(broadcast(mult), "domain")
      .withColumn("n_copies",
        expr("multiplier_milli DIV 1000") +
          when(pmod(Sampling.arithHash(col("id"), seed), lit(1000L))
            < col("multiplier_milli") % 1000, 1L).otherwise(0L))
      .withColumn("copy",
        explode(when(col("n_copies") >= 1, sequence(lit(1L), col("n_copies")))
          .otherwise(array().cast("array<bigint>"))))
      .select(col("id").as(idCol), col("domain"), col("copy"), col("n_copies"))
  }

  /** Unigram-LM document scoring — the shape of a CCNet/KenLM perplexity
    * filter (Wenzek et al. 2020, public) with the LM trained on the corpus
    * itself: per document, the count of tokens, the exact sum of corpus
    * frequencies of its tokens, their mean (how "common" the document's
    * vocabulary is — boilerplate scores high, gibberish scores low), and
    * the average token log-probability under the unigram LM.
    *
    * Scale shape: one explode to token rows, one vocabulary aggregate
    * (shuffle on the token, map-side combine — vocabulary size, not corpus
    * size), one equi-join of token rows against the vocabulary (AQE
    * broadcasts the LM while it fits), one per-document aggregate. No
    * driver materialization; the corpus-total token count rides along as a
    * broadcast scalar subquery, not a collect.
    *
    * Determinism: `n_tokens`/`freq_sum` are exact integers and
    * `avg_token_freq` one IEEE division of exact integers — bit-stable
    * across engines and shuffle orders. `avg_logprob` sums `ln` values
    * whose last ulp is libm-specific, so it is spec-checked (tolerance)
    * rather than oracle-hashed. */
  /** BM25 ranked retrieval (Robertson–Spärck Jones; Robertson & Zaragoza
    * 2009, public) — the quality-retrieval primitive a curation pipeline
    * uses to find documents matching a topic query at corpus scale.
    * `queryTerms` is a small (query_id, term) table; returns the top-`k`
    * documents per query by BM25 with parameters `k1`/`b`.
    *
    * Scale shape: one explode to token rows, three corpus aggregates
    * (per-doc-term tf, per-doc length, per-term document frequency — all
    * keyed shuffles with map-side combine), then the QUERY side drives the
    * work: term-frequency rows semi-joined against the broadcast query
    * terms, so only matching (doc, term) rows ever reach scoring; the
    * corpus-level (N, Σdl) statistics ride along as a broadcast single-row
    * aggregate, never a collect. Top-k is a per-query window over scored
    * docs only.
    *
    * Determinism: tf/df/dl are exact integers; the score mixes `ln` (libm
    * last-ulp) and a cross-term double sum (shuffle-order-dependent), so
    * the returned `bm25` is rounded to 4 decimals and the rank is computed
    * over the ROUNDED score with a doc-id tiebreak — both engines agree on
    * every output bit (the q43/q71 rounding convention). */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
    val tf = tok.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val parts = tf
      .join(broadcast(queryTerms.select(col("query_id"), col("term").as("w"))), "w")
      .join(dfreq, "w")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs"))
      .withColumn("idf",
        log((col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("part",
        col("idf") * (col("tf") * (lit(k1) + lit(1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))))
    val scored = parts.groupBy("query_id", "doc_id")
      .agg(round(sum(col("part")), 4).as("bm25"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("bm25").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "doc_id", "bm25", "rank")
  }

  /** FastText-style hashed linear document classifier (Joulin et al. 2016,
    * public) — the model-based quality-filter shape (DCLM / FineWeb-edu
    * style): hash each token into one of `dim` feature buckets, sum the
    * buckets' weights, keep documents whose score clears the threshold.
    *
    * Scale shape: explode to token rows → pure-arithmetic bucket →
    * broadcast weight lookup → one keyed sum with map-side combine. The
    * weight table is `dim` rows however large the corpus — always
    * broadcastable — and nothing else shuffles except the per-doc sum.
    *
    * Trained weights arrive as a `(bucket, weight)` DataFrame in integer
    * milli-units (exact sums, no shuffle-order float drift). Without one,
    * a deterministic arithmetic stub stands in — same plumbing, and
    * SQL-mirrorable end-to-end (the q96 oracle): the token hash is the
    * portable two-char/length code folded through Knuth multiplicative
    * hashing (the [[Sampling.arithHash]] idiom; xxhash64 would be the
    * scale choice but is not cross-engine reproducible). `keep` is the
    * integer comparison `raw_sum > 0` — no sigmoid, so zero libm/rounding
    * hazards in the gate. */
  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      dim: Int = 1024, weights: Option[DataFrame] = None): DataFrame = {
    require(dim > 0, "dim must be positive")
    val w = col("__w")
    val code = (ascii(w) * lit(961L) +
      when(length(w) >= 2, ascii(substring(w, 2, 1))).otherwise(lit(0)) * lit(31L) +
      length(w)).cast("long")
    val bucket = pmod(code * lit(2654435761L), lit(1000000007L)) % lit(dim.toLong)
    val tok = df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("__w"))
      .withColumn("__b", bucket)
    val weighted = weights match {
      case Some(tbl) => tok
        .join(broadcast(tbl.select(col("bucket").as("__b"), col("weight").as("__wt"))),
          Seq("__b"), "left_outer")
        .withColumn("__wt", coalesce(col("__wt"), lit(0L)))
      case None => tok
        .withColumn("__wt", pmod(col("__b") * lit(48271L), lit(2001L)) - lit(1000L))
    }
    val agg = weighted.groupBy("id")
      .agg(sum("__wt").as("raw_sum"), count(lit(1)).as("n_tokens"))
    df.select(col(idCol).as("id"))
      .join(agg, Seq("id"), "left_outer")
      .select(col("id").as(idCol),
        coalesce(col("raw_sum"), lit(0L)).as("raw_sum"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("raw_sum"), lit(0L)) > 0).as("keep"))
  }

  /** Bigram-LM document scoring — one rung up from [[unigramScore]]'s
    * CCNet shape: the corpus's own bigram table is the LM, and each
    * document is scored by its average Laplace-smoothed bigram
    * log-probability `ln((c(w1,w2)+1) / (c(w1,·)+V))` (V = corpus
    * vocabulary size; `c(w1,·)` the left-context count, so the smoothed
    * conditionals sum to 1 per context).
    *
    * Shape: bigrams come from one bounded per-document window (`lead`
    * over token position — a doc-keyed shuffle, frames bounded by doc
    * length), then two keyed count aggregates (bigram table, context
    * table) and joins back — the LM tables are vocabulary-sized, never
    * corpus-sized. Exact-integer columns (counts, corpus-frequency sums)
    * plus one IEEE division are the oracle-gated surface; `avg_logprob`
    * is libm-`ln`-sensitive and is spec-asserted with tolerance instead
    * (the q71 convention). */
  def bigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = df.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "w")))
    val byPos = Window.partitionBy("doc_id").orderBy("pos")
    val big = tok
      .withColumn("w2", lead(col("w"), 1).over(byPos))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), col("w").as("w1"),
        concat_ws(" ", col("w"), col("w2")).as("bg"))
    val lm2 = big.groupBy("bg").agg(count(lit(1)).as("c2"))
    val lm1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = tok.agg(countDistinct(col("w")).as("v_size"))
    big.join(lm2, "bg").join(lm1, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("c2")).cast("long").as("freq_sum"),
        sum(log((col("c2") + 1).cast("double") /
          (col("c1") + col("v_size")))).as("__sl"))
      .select(col("doc_id"), col("n_bigrams"), col("freq_sum"),
        (col("freq_sum").cast("double") / col("n_bigrams"))
          .as("avg_bigram_freq"),
        (col("__sl") / col("n_bigrams")).as("avg_logprob"))
  }

  def unigramScore(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("w"))
    val lm = tok.groupBy("w").agg(count(lit(1)).as("cnt"))
    val total = lm.agg(sum(col("cnt")).as("corpus_tokens"))
    tok.join(lm, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("cnt")).as("freq_sum"),
        sum(log(col("cnt").cast("double"))).as("__sumlog"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("freq_sum"),
        (col("freq_sum").cast("double") / col("n_tokens")).as("avg_token_freq"),
        (col("__sumlog") / col("n_tokens") -
          log(col("corpus_tokens").cast("double"))).as("avg_logprob"))
  }
}
