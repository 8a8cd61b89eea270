package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QDef
import graft.engine.Tables
import graft.er._

/** Entity-resolution coverage (SURVEY.md §2.8) over the driver testdata.
  *
  * A deterministic "dirty" entity table is derived from customer: every
  * customer appears twice (unique_id 2k and 2k+1), the copy's name mutated
  * by key — one third exact, one third a 1-char deletion (fuzzy), one third
  * upper-cased (disagreement) — transposing the reference's dedupe corpus
  * (`/root/reference/03_aml_entity_resolution.py:36-53`).
  *
  * The blocking + comparison-vector stages are DuckDB-oracle-checked
  * (levenshtein is integer-exact on both engines); the EM fit itself is
  * unit-tested against hand-computed Fellegi–Sunter values instead
  * (SURVEY.md §5), and the scored output is registered rows-only.
  */
object ErQueries {

  private def dirty(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    val orig = c.select(
      (col("c_custkey") * 2).as("unique_id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acctbal"),
      floor(col("c_acctbal")).cast("long").as("bucket"),
      substring(col("c_name"), 13, 3).as("digits"))
    val variantName = when(col("c_custkey") % 3 === 0,
        substring(col("c_name"), 1, 17)) // drop last char (names are 18 chars)
      .when(col("c_custkey") % 3 === 1, upper(col("c_name")))
      .otherwise(col("c_name"))
    val dup = c.select(
      (col("c_custkey") * 2 + 1).as("unique_id"),
      variantName.as("name"),
      col("c_nationkey").cast("long").as("nation"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acctbal"),
      floor(col("c_acctbal")).cast("long").as("bucket"),
      substring(col("c_name"), 13, 3).as("digits"))
    orig.union(dup)
  }

  private val dirtySql =
    """SELECT c_custkey*2 AS unique_id, c_name AS name,
              CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS segment,
              c_acctbal AS acctbal, CAST(floor(c_acctbal) AS BIGINT) AS bucket,
              substring(c_name, 13, 3) AS digits
       FROM customer
       UNION ALL
       SELECT c_custkey*2+1,
              CASE WHEN c_custkey%3=0 THEN substring(c_name, 1, 17)
                   WHEN c_custkey%3=1 THEN upper(c_name)
                   ELSE c_name END,
              CAST(c_nationkey AS BIGINT), c_mktsegment,
              c_acctbal, CAST(floor(c_acctbal) AS BIGINT),
              substring(CASE WHEN c_custkey%3=0 THEN substring(c_name, 1, 17)
                             WHEN c_custkey%3=1 THEN upper(c_name)
                             ELSE c_name END, 13, 3)
       FROM customer"""

  private val settings = ErSettings(
    uniqueId = "unique_id",
    blockingRules = Seq(
      "l.bucket = r.bucket",
      "l.nation = r.nation AND l.segment = r.segment AND l.digits = r.digits"),
    comparisons = Seq(
      ComparisonColumn("name", fuzzy = Some(LevenshteinLevel(2)), termFrequency = false),
      ComparisonColumn("acctbal")),
    maxIter = 8, tol = 1e-5)

  /** Blocked pair generation: union of per-rule equi-joins + pair dedup ==
    * OR-of-rules semantics, but each rule stays a hash join (the manual
    * O(n²)-avoidance the reference gets from splink `blocking_rules`,
    * SURVEY.md §4). */
  private val q21 = QDef(
    "q21_er_blocked_pairs",
    (s, dir) => Blocking.pairs(dirty(s, dir), settings)
      .select(col("unique_id_l"), col("unique_id_r"), col("name_l"), col("name_r"))
      .orderBy("unique_id_l", "unique_id_r"),
    Some(s"""WITH d AS ($dirtySql)
             SELECT l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
                    l.name AS name_l, r.name AS name_r
             FROM d l JOIN d r
               ON (l.bucket = r.bucket
                   OR (l.nation = r.nation AND l.segment = r.segment
                       AND l.digits = r.digits))
                  AND l.unique_id < r.unique_id
             ORDER BY unique_id_l, unique_id_r"""))

  /** Comparison (gamma) vectors: exact / fuzzy / disagree per column —
    * string fuzzy via levenshtein ≤ 2, numeric fuzzy via within-tolerance
    * (SURVEY.md §2.8) — pure codegen'd projections over the blocked pairs. */
  private val q22 = QDef(
    "q22_er_gamma",
    (s, dir) => Comparison
      .withGammas(Blocking.pairs(dirty(s, dir), settings),
        Seq(
          ComparisonColumn("name", fuzzy = Some(LevenshteinLevel(2))),
          ComparisonColumn("acctbal", fuzzy = Some(NumericToleranceLevel(5.0)))))
      .select(
        col("unique_id_l"), col("unique_id_r"),
        col("gamma_name"), col("gamma_acctbal"))
      .orderBy("unique_id_l", "unique_id_r"),
    Some(s"""WITH d AS ($dirtySql)
             SELECT l.unique_id AS unique_id_l, r.unique_id AS unique_id_r,
                    CASE WHEN l.name = r.name THEN 2
                         WHEN levenshtein(l.name, r.name) <= 2 THEN 1
                         ELSE 0 END AS gamma_name,
                    CASE WHEN l.acctbal = r.acctbal THEN 2
                         WHEN abs(l.acctbal - r.acctbal) <= 5.0 THEN 1
                         ELSE 0 END AS gamma_acctbal
             FROM d l JOIN d r
               ON (l.bucket = r.bucket
                   OR (l.nation = r.nation AND l.segment = r.segment
                       AND l.digits = r.digits))
                  AND l.unique_id < r.unique_id
             ORDER BY unique_id_l, unique_id_r"""))

  /** Full EM-scored comparisons (`get_scored_comparisons`, reference
    * `:57-58`). EM has no SQL oracle (SURVEY.md §5) → registered rows-only;
    * the fit itself is unit-tested in FellegiSunterSpec. */
  private val q23 = QDef(
    "q23_er_scores",
    (s, dir) => {
      val (scored, _) = EntityResolver.scoredComparisons(dirty(s, dir), settings)
      scored
        .select(
          col("unique_id_l"), col("unique_id_r"),
          col("gamma_name"), col("gamma_acctbal"),
          round(col("match_probability"), 6).as("match_probability"))
        .orderBy("unique_id_l", "unique_id_r")
    },
    None)

  val all: Seq[QDef] = Seq(q21, q22, q23)
}
