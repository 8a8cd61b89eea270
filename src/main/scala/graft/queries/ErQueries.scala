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
  * unit-tested against hand-computed Fellegi–Sunter values (SURVEY.md §5),
  * and the scored output registers a pattern-summary oracle whose monotone
  * columns assert the isotonic-M-step construction invariant (q23/q47);
  * clustering registers a full value oracle via an EM-free gamma rule
  * (q78).
  */
object ErQueries {

  private[graft] def dirty(s: SparkSession, dir: String): DataFrame = {
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

  private[graft] val settings = ErSettings(
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
    * `:57-58`), reported as the per-gamma-pattern summary
    * ([[FellegiSunter.patternSummary]]): EM's fitted probabilities have no
    * closed-form SQL, but (a) the per-pattern pair counts ARE
    * SQL-expressible — a real cross-engine check of the exact
    * blocking+gamma pipeline EM consumes — and (b) the EM output must
    * satisfy assertable laws (probability constant per pattern, inside
    * (0,1), monotone in every gamma coordinate), which the oracle pins to
    * TRUE. A fit regression flips an assertion value and fails the value
    * hash. The fit itself is additionally unit-tested against hand-computed
    * Fellegi–Sunter values (FellegiSunterSpec). */
  private val q23 = QDef(
    "q23_er_scores",
    (s, dir) => {
      val (scored, _) = EntityResolver.scoredComparisons(dirty(s, dir), settings,
        materializePairs = true)
      FellegiSunter.patternSummary(scored, settings.comparisons)
    },
    Some(s"""WITH d AS ($dirtySql),
             g AS (SELECT CASE WHEN l.name = r.name THEN 2
                               WHEN levenshtein(l.name, r.name) <= 2 THEN 1
                               ELSE 0 END AS gamma_name,
                          CASE WHEN l.acctbal = r.acctbal THEN 1 ELSE 0 END AS gamma_acctbal
                   FROM d l JOIN d r
                     ON (l.bucket = r.bucket
                         OR (l.nation = r.nation AND l.segment = r.segment
                             AND l.digits = r.digits))
                        AND l.unique_id < r.unique_id)
             SELECT gamma_name, gamma_acctbal,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    TRUE AS prob_constant, TRUE AS prob_in_unit,
                    TRUE AS monotone_name, TRUE AS monotone_acctbal
             FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  // ---------------------------------------------------------------------
  // Second ER pass, transaction-shaped (the reference reruns Splink over
  // rptd_originator_name / rptd_original_address derived from transactions,
  // `/root/reference/03_aml_entity_resolution.py:115-133`): a per-txn dirty
  // table — reported originator name mutated per transaction, reported
  // address derived from the customer's nation — resolved by the SAME
  // EntityResolver under different ErSettings (JW fuzzy name + exact
  // address, address/date blocking). Proves config-driven operator reuse
  // inside the oracle harness, not just in PipelinesSpec.
  // ---------------------------------------------------------------------

  private[graft] def txnEntities(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.load(s, dir, "orders")
    val c = Tables.load(s, dir, "customer")
    val n = Tables.load(s, dir, "nation")
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(
        col("o_orderkey").as("txn_id"),
        when(col("o_orderkey") % 4 === 0, col("c_name"))
          .when(col("o_orderkey") % 4 === 1, substring(col("c_name"), 1, 17))
          .when(col("o_orderkey") % 4 === 2, upper(col("c_name")))
          .otherwise(translate(col("c_name"), "#", "-")).as("name"),
        concat(col("n_name"), lit(" "), (col("c_custkey") % 97).cast("string"))
          .as("address"),
        col("o_orderdate").as("odate"),
        col("o_totalprice").as("amount"))
  }

  private val txnEntitiesSql =
    """SELECT o_orderkey AS txn_id,
              CASE o_orderkey % 4
                WHEN 0 THEN c_name
                WHEN 1 THEN substring(c_name, 1, 17)
                WHEN 2 THEN upper(c_name)
                ELSE translate(c_name, '#', '-') END AS name,
              n_name || ' ' || CAST(c_custkey % 97 AS VARCHAR) AS address,
              o_orderdate AS odate,
              o_totalprice AS amount
       FROM orders
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey"""

  /** Second-pass settings: Jaro–Winkler fuzzy name (splink 2.x's default
    * fuzzy comparison — our codegen'd expression is bit-identical to
    * DuckDB's jaro_winkler_similarity, so the gamma is fully
    * oracle-checkable) + exact reported address. Blocking keys are chosen
    * for 100 TB shape: rule 1 (same address + same mutation-invariant name
    * digits) keys blocks to roughly one originator, rule 2 (same day +
    * similar amount — the classic AML heuristic) cells stay O(1), so the
    * pair count grows linearly with transactions, never quadratically —
    * blocking on address or date alone produced ~16M pairs at sf0.1 and
    * would be unbounded at scale. */
  private[graft] val txnSettings = ErSettings(
    uniqueId = "txn_id",
    blockingRules = Seq(
      "l.address = r.address AND substring(l.name, 10, 8) = substring(r.name, 10, 8)",
      "l.odate = r.odate AND floor(l.amount / 1000) = floor(r.amount / 1000)"),
    comparisons = Seq(
      ComparisonColumn("name", fuzzy = Some(JaroWinklerLevel(0.9))),
      ComparisonColumn("address")),
    maxIter = 8, tol = 1e-5)

  /** Second-pass blocking + comparison vectors over the transaction-shaped
    * table — same operators as q21/q22, different config and shape. */
  private val q46 = QDef(
    "q46_er_txn_gamma",
    (s, dir) => Comparison
      .withGammas(Blocking.pairs(txnEntities(s, dir), txnSettings),
        txnSettings.comparisons)
      .select(col("txn_id_l"), col("txn_id_r"),
        col("gamma_name"), col("gamma_address"))
      .orderBy("txn_id_l", "txn_id_r"),
    Some(s"""WITH t AS ($txnEntitiesSql),
             p AS (SELECT l.txn_id AS txn_id_l, r.txn_id AS txn_id_r,
                          l.name AS nl, r.name AS nr,
                          l.address AS al, r.address AS ar
                   FROM t l JOIN t r
                     ON ((l.address = r.address
                          AND substring(l.name, 10, 8) = substring(r.name, 10, 8))
                         OR (l.odate = r.odate
                             AND floor(l.amount / 1000) = floor(r.amount / 1000)))
                        AND l.txn_id < r.txn_id)
             SELECT txn_id_l, txn_id_r,
                    CASE WHEN nl = nr THEN 2
                         WHEN jaro_winkler_similarity(nl, nr) >= 0.9 THEN 1
                         ELSE 0 END AS gamma_name,
                    CASE WHEN al = ar THEN 1 ELSE 0 END AS gamma_address
             FROM p ORDER BY txn_id_l, txn_id_r"""))

  /** Second-pass EM fit + scoring (config-driven reuse of the full
    * EntityResolver), reported as the oracle-checkable pattern summary —
    * see q23 for the assertion semantics. */
  private val q47 = QDef(
    "q47_er_txn_scores",
    (s, dir) => {
      val (scored, _) = EntityResolver.scoredComparisons(txnEntities(s, dir), txnSettings,
        materializePairs = true)
      FellegiSunter.patternSummary(scored, txnSettings.comparisons)
    },
    Some(s"""WITH t AS ($txnEntitiesSql),
             g AS (SELECT CASE WHEN l.name = r.name THEN 2
                               WHEN jaro_winkler_similarity(l.name, r.name) >= 0.9 THEN 1
                               ELSE 0 END AS gamma_name,
                          CASE WHEN l.address = r.address THEN 1 ELSE 0 END AS gamma_address
                   FROM t l JOIN t r
                     ON ((l.address = r.address
                          AND substring(l.name, 10, 8) = substring(r.name, 10, 8))
                         OR (l.odate = r.odate
                             AND floor(l.amount / 1000) = floor(r.amount / 1000)))
                        AND l.txn_id < r.txn_id)
             SELECT gamma_name, gamma_address,
                    CAST(count(*) AS BIGINT) AS n_pairs,
                    TRUE AS prob_constant, TRUE AS prob_in_unit,
                    TRUE AS monotone_name, TRUE AS monotone_address
             FROM g GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Pairwise predictions → entity clusters
    * ([[EntityResolver.clusterPairs]], splink's
    * `cluster_pairwise_predictions_at_threshold`): connected components
    * over the strong-match pairs (name within Levenshtein 2 AND exact
    * balance — an EM-free gamma rule, so the oracle can recompute the same
    * pairs in SQL), min-member cluster ids, singletons for unmatched
    * records. Oracle: recursive-CTE reachability over the same pair set. */
  private val q78 = QDef(
    "q78_er_clusters",
    (s, dir) => {
      val d = dirty(s, dir)
      val pairs = Comparison.withGammas(Blocking.pairs(d, settings),
        Seq(
          ComparisonColumn("name", fuzzy = Some(LevenshteinLevel(2))),
          ComparisonColumn("acctbal")))
      EntityResolver
        .clusterPairs(d, pairs, "unique_id",
          col("gamma_name") >= 1 && col("gamma_acctbal") === 1)
        .orderBy("unique_id")
    },
    Some(s"""WITH RECURSIVE d AS ($dirtySql),
             p AS (
               SELECT l.unique_id AS ul, r.unique_id AS ur
               FROM d l JOIN d r
                 ON (l.bucket = r.bucket
                     OR (l.nation = r.nation AND l.segment = r.segment
                         AND l.digits = r.digits))
                    AND l.unique_id < r.unique_id
               WHERE levenshtein(l.name, r.name) <= 2
                 AND l.acctbal = r.acctbal),
             eb AS (SELECT ul AS src, ur AS dst FROM p
                    UNION ALL SELECT ur, ul FROM p),
             nodes AS (SELECT DISTINCT src AS id FROM eb),
             reach(root, node) AS (
               SELECT id, id FROM nodes
               UNION
               SELECT r.root, eb.dst FROM reach r JOIN eb ON r.node = eb.src),
             comp AS (SELECT root AS id, min(node) AS component
                      FROM reach GROUP BY root)
             SELECT d.unique_id, coalesce(comp.component, d.unique_id) AS cluster_id
             FROM d LEFT JOIN comp ON d.unique_id = comp.id
             ORDER BY d.unique_id"""))

  /** Unlinkables diagnostic ([[Blocking.unlinkables]], splink's
    * `unlinkables` analysis): share of txn records with zero candidate
    * pairs under the q46/q47 blocking rules — the blocking-recall health
    * check (`03_aml_entity_resolution.py:72-75` analogue). Run on the
    * txn-shaped pass, whose rules genuinely strand some records (the
    * dedupe fixture's bucket rule always pairs each record with its own
    * twin, which would make this a constant-zero non-check). */
  private val q169 = QDef(
    "q169_er_unlinkables",
    (s, dir) => Blocking.unlinkables(txnEntities(s, dir), txnSettings),
    Some(s"""WITH t AS ($txnEntitiesSql),
             p AS (SELECT l.txn_id AS a, r.txn_id AS b
                   FROM t l JOIN t r
                     ON ((l.address = r.address
                          AND substring(l.name, 10, 8) = substring(r.name, 10, 8))
                         OR (l.odate = r.odate
                             AND floor(l.amount / 1000) = floor(r.amount / 1000)))
                        AND l.txn_id < r.txn_id),
             u AS (SELECT a AS uid FROM p UNION SELECT b AS uid FROM p)
             SELECT CAST(count(*) AS BIGINT) AS n_records,
                    CAST(count(*) - count(u.uid) AS BIGINT) AS n_unlinkable,
                    (CAST(count(*) - count(u.uid) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE)) AS unlinkable_share
             FROM (SELECT DISTINCT txn_id FROM t) r
             LEFT JOIN u ON u.uid = r.txn_id"""))

  /** q172: block-size telemetry ([[Blocking.blockStats]], splink's
    * `count_comparisons_from_blocking_rule` pre-flight + the size
    * distribution): per rule, block count, max/p99 block size, and the
    * exact candidate-pair count the rule's join would emit — computed
    * from per-block counts alone, never generating a pair. The scale
    * pre-flight for the one quadratic-per-block generator in the engine
    * (read it before choosing [[ErSettings.maxBlockSize]]). Runs on the
    * q21 dedupe fixture so the oracle can recompute both rules' blocks. */
  private val q172 = QDef(
    "q172_er_block_stats",
    (s, dir) => Blocking.blockStats(dirty(s, dir), settings)
      .orderBy("rule_idx"),
    Some(s"""WITH d AS ($dirtySql),
             b1 AS (SELECT count(*) AS n FROM d
                    WHERE bucket IS NOT NULL GROUP BY bucket),
             b2 AS (SELECT count(*) AS n FROM d
                    WHERE nation IS NOT NULL AND segment IS NOT NULL
                      AND digits IS NOT NULL
                    GROUP BY nation, segment, digits)
             SELECT CAST(1 AS BIGINT) AS rule_idx,
                    CAST(count(*) AS BIGINT) AS n_blocks,
                    CAST(max(n) AS BIGINT) AS max_block,
                    round(quantile_cont(n, 0.99), 3) AS p99_block,
                    CAST(sum(n * (n - 1) // 2) AS BIGINT) AS cand_pairs
             FROM b1
             UNION ALL
             SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
                    CAST(max(n) AS BIGINT),
                    round(quantile_cont(n, 0.99), 3),
                    CAST(sum(n * (n - 1) // 2) AS BIGINT)
             FROM b2
             ORDER BY rule_idx"""))

  val all: Seq[QDef] = Seq(q21, q22, q23, q46, q47, q78, q169, q172)
}
