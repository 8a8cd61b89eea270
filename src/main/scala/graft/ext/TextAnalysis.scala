package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for corpus curation: n-gram-free language ID
  * (stopword voting), quality scoring, token counting, and a rolling-hash
  * document fingerprint. Pure scalar/higher-order expressions — codegen'd,
  * shuffle-free, and expressible in ANSI SQL for the DuckDB oracle.
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
}
