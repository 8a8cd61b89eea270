package graft.er

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Config-driven entity resolution: blocked pairwise self-join → comparison
  * (gamma) vectors → EM-fitted Fellegi–Sunter match probabilities.
  *
  * Re-expresses the surface the reference drives through Splink 2.1.14
  * (`/root/reference/03_aml_entity_resolution.py:34-58,115-133`; SURVEY.md
  * §2.8) on public knowledge: Fellegi & Sunter (1969), EM as described in
  * the reference itself (`03_aml_entity_resolution.py:79`). Config-driven by
  * design — the reference runs the same operator twice with different
  * settings (`:115-133`).
  */

/** One comparison column. `fuzzy` adds a middle gamma level between exact
  * match and disagreement; `termFrequency` enables the common-value weight
  * correction at scoring time (splink's `term_frequency_adjustments`,
  * reference `:41-47`). */
final case class ComparisonColumn(
    name: String,
    fuzzy: Option[FuzzyLevel] = None,
    termFrequency: Boolean = false) {
  /** gamma levels: -1 null, 0 disagree, [1 fuzzy,] top = exact */
  def numLevels: Int = if (fuzzy.isDefined) 3 else 2
  def exactLevel: Int = numLevels - 1
}

sealed trait FuzzyLevel
/** Jaro–Winkler similarity at or above `threshold` (splink 2.x default
  * fuzzy comparison). */
final case class JaroWinklerLevel(threshold: Double) extends FuzzyLevel
/** Levenshtein edit distance at or below `maxDistance` (integer-exact,
  * oracle-friendly). */
final case class LevenshteinLevel(maxDistance: Int) extends FuzzyLevel
/** Numeric within-tolerance (SURVEY.md §2.8: "numeric = exact /
  * within-tolerance"). */
final case class NumericToleranceLevel(tolerance: Double) extends FuzzyLevel
/** Phonetic match via Soundex codes (splink-style phonetic level). */
case object SoundexLevel extends FuzzyLevel
/** Phonetic match via Double Metaphone primary codes — splink's stronger
  * phonetic level; an `includeAlternate` match also accepts the secondary
  * (ethnic-variant) code on either side. */
final case class DoubleMetaphoneLevel(includeAlternate: Boolean = false) extends FuzzyLevel

/** Settings mirroring the splink settings dict the reference passes
  * (`link_type: dedupe_only`, `blocking_rules`, `comparison_columns`). */
final case class ErSettings(
    uniqueId: String,
    blockingRules: Seq[String], // SQL conditions over `l.` / `r.` aliases
    comparisons: Seq[ComparisonColumn],
    maxIter: Int = 20,
    tol: Double = 1e-6,
    initialLambda: Double = 0.1,
    /** Salt factor for the blocking self-join. Blocking rules like
      * `l.amount = r.amount` are skew-prone: one hot value (the classic
      * round-number transaction amount) sends every one of its c rows to a
      * single sort-merge task that then emits ~c²/2 pairs alone. With
      * `blockingSalt = Some(s)`, the left side scatters across s sub-keys
      * and the right side replicates s× — per-task pair work drops to
      * ~c²/(2s) while the generated pair SET is bit-identical (each (l, r)
      * pair meets at exactly one salt). None (default) keeps the plain
      * equi-join — right for well-distributed blocking keys, where salting
      * would pay s× right-side duplication for nothing. */
    blockingSalt: Option[Int] = None,
    /** Splink's production `estimate_u` workflow: estimate u once from
      * random pairs ([[FellegiSunter.estimateU]] — almost all random pairs
      * are non-matches, so their gamma distribution IS u), hold it FIXED,
      * and EM-fit only m and lambda from the blocked pairs. Blocked pairs
      * over-represent matches by construction, so u estimated from them is
      * biased toward agreement; fixing u from an unbiased sample is what
      * the reference's tool does before `get_scored_comparisons`. Default
      * false = classic joint EM over blocked pairs (the formulation the
      * registered oracle queries pin). */
    fixUFromRandomPairs: Boolean = false,
    /** Target random-pair count for the fixed-u estimate. */
    uTargetPairs: Long = 1000000L,
    /** Block-purge cap ("block purging", Papadakis et al., ACM CSUR 2020
      * §block cleaning): when set, each rule's pair join sees only records
      * whose block under THAT rule holds ≤ maxBlockSize records; oversized
      * blocks are dropped for that rule (they can still pair under other
      * rules). Pair work per rule is then bounded by
      * n_blocks · maxBlockSize², whatever the data does — the quadratic
      * per-block candidate generator is the one unbounded spot in the ER
      * DAG, and at 100 TB a single hyper-common blocking value (a default
      * address, an empty name) otherwise owns the job. RECALL TRADEOFF:
      * a purged block's true matches are lost for that rule, so run
      * [[Blocking.blockStats]] first — it reports exactly what a given
      * cap would drop. None (default) = exact splink semantics; the
      * registered oracle queries pin that. Requires every conjunct of
      * every rule to be a symmetric equality (see [[Blocking.ruleKeys]]);
      * salting composes (purge first, salt the survivors). */
    maxBlockSize: Option[Int] = None)

/** Fitted Fellegi–Sunter parameters: P(gamma level | match) = m,
  * P(gamma level | non-match) = u, overall match proportion lambda. */
final case class FsParams(
    lambda: Double,
    m: Map[String, Array[Double]],
    u: Map[String, Array[Double]])

object Blocking {
  /** Blocked pair generation (`dedupe_only` self-linkage): one equi-join per
    * blocking rule — each rule MUST be an equality-anchored condition so
    * Catalyst plans a hash join, never a cartesian — unioned and
    * deduplicated, with `l.uid < r.uid` halving the pair space. Output
    * columns are suffixed `_l` / `_r` (the splink convention, reference
    * `:138`). */
  def pairs(df: DataFrame, settings: ErSettings): DataFrame =
    settings.blockingRules.map(rulePairs(df, settings, _))
      .reduce(_ union _)
      .dropDuplicates(s"${settings.uniqueId}_l", s"${settings.uniqueId}_r")

  /** Unlinkables diagnostic (splink's `unlinkables` analysis, reference
    * `03_aml_entity_resolution.py` surface): the share of records with
    * ZERO candidate pairs under the active blocking rules — records the
    * linker can never link no matter how good the model is, the first
    * number to check when recall looks low (too-tight blocking shows up
    * here before it shows up in scores). One row: record count,
    * unlinkable count, share.
    *
    * Shape: the per-rule pair joins (no pair-level dedup — only
    * per-record ANY-pair existence matters, so one uid-distinct replaces
    * the pair-dedup exchange), an anti-join of the record ids against
    * the linked-id set, two single-row aggregates crossed via broadcast.
    * The share is one correctly-rounded double division of exact longs —
    * bit-stable, unrounded. */
  def unlinkables(df: DataFrame, settings: ErSettings): DataFrame = {
    val uid = settings.uniqueId
    val p = settings.blockingRules.map(rulePairs(df, settings, _))
      .reduce(_ union _)
    val linked = p.select(col(s"${uid}_l").as("uid"))
      .unionAll(p.select(col(s"${uid}_r").as("uid")))
      .distinct()
    val recs = df.select(col(uid).as("uid")).distinct()
    recs.join(linked, Seq("uid"), "left_anti")
      .agg(count(lit(1)).as("n_unlinkable"))
      .crossJoin(broadcast(recs.agg(count(lit(1)).as("n_records"))))
      .select(col("n_records"), col("n_unlinkable"),
        (col("n_unlinkable").cast("double") /
          col("n_records").cast("double")).as("unlinkable_share"))
  }

  /** A blocking rule's per-record block-key expressions: every conjunct
    * must be a SYMMETRIC equality `f(l.…) = f(r.…)` — the same expression
    * on both sides modulo the alias — and the returned columns are each
    * `f` over bare column names, so `df.groupBy(ruleKeys(rule))` groups
    * records into exactly the blocks the rule's self-join pairs within.
    * Parsed with Spark's own SQL parser (no regex fragility); rejects
    * non-equality conjuncts and asymmetric equalities loudly, since a
    * block-size readout for a theta condition would silently lie. */
  private[graft] def ruleKeys(spark: org.apache.spark.sql.SparkSession,
      rule: String): Seq[Column] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}
    def strip(alias: String)(e: Expression): Expression = e.transform {
      case a: UnresolvedAttribute
          if a.nameParts.length == 2 && a.nameParts.head.equalsIgnoreCase(alias) =>
        UnresolvedAttribute(Seq(a.nameParts(1)))
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    // a symmetric equality is legal written either way around
    // (`l.x = r.x` or `r.x = l.x`) — but each side must reference exactly
    // ONE alias and the two sides must reference DIFFERENT aliases,
    // enforced before stripping: blindly stripping both aliases from both
    // sides would silently accept a typo'd tautology like `l.x = l.x`
    // (always true — a non-blocking cross join) as a block key on x
    def aliasesOf(e: Expression): Set[String] = e.collect {
      case a: UnresolvedAttribute if a.nameParts.length == 2 =>
        a.nameParts.head.toLowerCase(java.util.Locale.ROOT)
    }.toSet
    val bare = (e: Expression) => strip("r")(strip("l")(e))
    conjuncts(spark.sessionState.sqlParser.parseExpression(rule)).map {
      case EqualTo(lhs, rhs) =>
        require(Set(aliasesOf(lhs), aliasesOf(rhs)) == Set(Set("l"), Set("r")),
          s"blocking rule conjunct must compare side l with side r: " +
            s"${lhs.sql} = ${rhs.sql}")
        val lk = bare(lhs)
        val rk = bare(rhs)
        require(lk.sql == rk.sql,
          s"blocking rule conjunct is not a symmetric equality: ${lhs.sql} = ${rhs.sql}")
        graft.functions.Cols.of(lk)
      case other => throw new IllegalArgumentException(
        s"blocking rule conjunct is not an equality: ${other.sql}")
    }
  }

  /** Block-size telemetry per rule (splink's
    * `count_comparisons_from_blocking_rule` pre-flight, plus the size
    * distribution): for each rule, the number of blocks, the largest
    * block, the p99 block size, and the exact candidate-pair count
    * Σ n·(n−1)/2 the rule's join WILL emit — computed from per-block
    * counts only, without generating a single pair. THE number to read
    * before running blocking at scale: pair volume is quadratic in block
    * size, so a max_block in the thousands means one rule owns the job
    * (and tells you what [[ErSettings.maxBlockSize]] cap would bound it,
    * and what that cap would drop). One count-aggregate per rule over the
    * record table — linear, broadcast-free, safe at any scale.
    *
    * NULL block keys: rows where ANY of the rule's key expressions is
    * NULL are excluded before the per-block aggregate — the rule's
    * equi-join never matches NULL keys (SQL `NULL = NULL` is not true),
    * so counting them as a block (groupBy groups nulls together) would
    * over-predict the pair count on exactly the dirty data this
    * pre-flight targets. The readout is the pair count the join WILL
    * emit, null-keyed rows contributing zero pairs under this rule. */
  def blockStats(df: DataFrame, settings: ErSettings): DataFrame =
    settings.blockingRules.zipWithIndex.map { case (rule, i) =>
      val keys = ruleKeys(df.sparkSession, rule)
      df.where(keys.map(_.isNotNull).reduce(_ && _))
        .groupBy(keys: _*).agg(count(lit(1)).as("__n"))
        .agg(
          count(lit(1)).as("n_blocks"),
          max(col("__n")).as("max_block"),
          round(expr("percentile(__n, 0.99)"), 3).as("p99_block"),
          sum(col("__n") * (col("__n") - 1) / 2).cast("long").as("cand_pairs"))
        .select(lit(i + 1).cast("long").as("rule_idx"), col("n_blocks"),
          col("max_block"), col("p99_block"), col("cand_pairs"))
    }.reduce(_ unionAll _)

  /** One blocking rule's pair join — plain, or salted per
    * [[ErSettings.blockingSalt]]. Salting conjoins `l.__salt = r.__salt`
    * onto the rule: the left row's salt is a hash of the whole row, the
    * right side carries every salt value, so Catalyst extracts
    * (rule keys, __salt) as the equi-join key and a hot blocking value
    * spreads over `salt` tasks instead of one. Exposed package-private so
    * ErSpec can assert per-task pair bounds on the pre-dedup join.
    * With [[ErSettings.maxBlockSize]] set, records in oversized blocks
    * (w.r.t. THIS rule's keys) are purged before the join — one
    * whole-partition count window on the block keys, riding the same
    * hash partitioning the join needs anyway. */
  private[graft] def rulePairs(df0: DataFrame, settings: ErSettings,
      rule: String): DataFrame = {
    val df = settings.maxBlockSize match {
      case Some(cap) =>
        val keys = ruleKeys(df0.sparkSession, rule)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(keys: _*)
        df0.withColumn("__bn", count(lit(1)).over(w))
          .where(col("__bn") <= cap).drop("__bn")
      case None => df0
    }
    val uid = settings.uniqueId
    val outCols =
      df.columns.map(c => col(s"l.$c").as(s"${c}_l")) ++
        df.columns.map(c => col(s"r.$c").as(s"${c}_r"))
    settings.blockingSalt match {
      case None =>
        df.as("l")
          .join(df.as("r"), expr(rule) && col(s"l.$uid") < col(s"r.$uid"))
          .select(outCols.toIndexedSeq: _*)
      case Some(s) =>
        require(s > 1, "blockingSalt must be > 1")
        val allCols: Seq[Column] = df.columns.map(col).toIndexedSeq
        val left = df.withColumn("__salt", pmod(xxhash64(allCols: _*), lit(s)))
        val right = df.withColumn("__salt",
          explode(sequence(lit(0), lit(s - 1)).cast("array<long>")))
        left.as("l")
          .join(right.as("r"),
            expr(rule) && col("l.__salt") === col("r.__salt") &&
              col(s"l.$uid") < col(s"r.$uid"))
          .select(outCols.toIndexedSeq: _*)
    }
  }
}

object Comparison {
  /** Append one `gamma_<col>` level column per comparison (the comparison
    * vector). Pure projections — whole-stage codegen'd, no shuffle. */
  def withGammas(pairs: DataFrame, comparisons: Seq[ComparisonColumn]): DataFrame =
    comparisons.foldLeft(pairs) { (d, c) =>
      val l = col(s"${c.name}_l")
      val r = col(s"${c.name}_r")
      val base = when(l.isNull || r.isNull, lit(-1))
        .when(l === r, lit(c.exactLevel))
      val gamma = c.fuzzy match {
        case None => base.otherwise(lit(0))
        case Some(LevenshteinLevel(maxD)) =>
          base.when(levenshtein(l, r) <= maxD, lit(1)).otherwise(lit(0))
        case Some(JaroWinklerLevel(t)) =>
          base.when(call_function("jaro_winkler", l, r) >= t, lit(1)).otherwise(lit(0))
        case Some(NumericToleranceLevel(tol)) =>
          base.when(abs(l - r) <= tol, lit(1)).otherwise(lit(0))
        case Some(SoundexLevel) =>
          base.when(soundex(l) === soundex(r), lit(1)).otherwise(lit(0))
        case Some(DoubleMetaphoneLevel(alt)) =>
          val pri = call_function("double_metaphone", l) ===
            call_function("double_metaphone", r)
          val cond =
            if (!alt) pri
            else pri ||
              call_function("double_metaphone_alt", l) ===
                call_function("double_metaphone_alt", r) ||
              call_function("double_metaphone", l) ===
                call_function("double_metaphone_alt", r) ||
              call_function("double_metaphone_alt", l) ===
                call_function("double_metaphone", r)
          base.when(cond, lit(1)).otherwise(lit(0))
      }
      d.withColumn(s"gamma_${c.name}", gamma)
    }
}

object FellegiSunter {

  /** P(level | params) as a when-chain over the gamma column; level -1
    * (null) contributes a neutral factor of 1. */
  private def levelProb(gamma: Column, probs: Array[Double]): Column =
    probs.zipWithIndex.foldLeft(lit(1.0)) { case (acc, (p, g)) =>
      when(gamma === g, lit(p)).otherwise(acc)
    }

  private def matchProbability(params: FsParams, comparisons: Seq[ComparisonColumn]): Column = {
    val mProd = comparisons.map(c => levelProb(col(s"gamma_${c.name}"), params.m(c.name))).reduce(_ * _)
    val uProd = comparisons.map(c => levelProb(col(s"gamma_${c.name}"), params.u(c.name))).reduce(_ * _)
    val a = lit(params.lambda) * mProd
    val b = lit(1.0 - params.lambda) * uProd
    a / (a + b)
  }

  /** Pool-adjacent-violators step making the likelihood ratio m/u
    * non-decreasing in the gamma level (higher agreement must never be
    * weaker match evidence — the ordering splink effectively assumes, and
    * what makes the fitted match probability provably monotone in every
    * gamma coordinate rather than empirically so). Violating adjacent
    * levels are pooled: each level keeps its total mass m+u but takes the
    * pooled block's m:u ratio, so per-block (and hence global) m and u sums
    * are preserved exactly and renormalization is untouched. */
  private[graft] def isotonic(mIn: Array[Double], uIn: Array[Double]): (Array[Double], Array[Double]) = {
    final case class Block(var m: Double, var u: Double, var start: Int, var end: Int) {
      def ratio: Double =
        if (u > 0) m / u else if (m > 0) Double.PositiveInfinity else 0.0
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (g <- mIn.indices) {
      blocks += Block(mIn(g), uIn(g), g, g)
      while (blocks.length >= 2 && blocks(blocks.length - 2).ratio > blocks.last.ratio) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.last
        a.m += b.m; a.u += b.u; a.end = b.end
      }
    }
    val outM = new Array[Double](mIn.length)
    val outU = new Array[Double](uIn.length)
    blocks.foreach { b =>
      val t = b.m + b.u
      for (g <- b.start to b.end) {
        val tg = mIn(g) + uIn(g)
        if (t > 0) { outM(g) = tg * b.m / t; outU(g) = tg * b.u / t }
      }
    }
    (outM, outU)
  }

  /** [[isotonic]] for the fixed-u EM mode: u is pinned, so monotonicity of
    * the likelihood ratio is restored by redistributing M-MASS only — each
    * PAV-pooled block's levels take m_g = u_g · (Σm / Σu over the block),
    * which preserves the block's total m exactly while giving every level
    * in it the same (now non-decreasing) ratio. */
  private[graft] def isotonicAgainstFixedU(mIn: Array[Double], uFixed: Array[Double]): Array[Double] = {
    final case class Block(var m: Double, var u: Double, var start: Int, var end: Int) {
      def ratio: Double =
        if (u > 0) m / u else if (m > 0) Double.PositiveInfinity else 0.0
    }
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (g <- mIn.indices) {
      blocks += Block(mIn(g), uFixed(g), g, g)
      while (blocks.length >= 2 && blocks(blocks.length - 2).ratio > blocks.last.ratio) {
        val b = blocks.remove(blocks.length - 1)
        val a = blocks.last
        a.m += b.m; a.u += b.u; a.end = b.end
      }
    }
    val out = new Array[Double](mIn.length)
    blocks.foreach { b =>
      val r = if (b.u > 0) b.m / b.u else 0.0
      for (g <- b.start to b.end)
        out(g) = if (b.u > 0) uFixed(g) * r else mIn(g)
    }
    out
  }

  /** EM fit over the agreement-pattern contingency table (the classic
    * Fellegi–Sunter formulation, and how splink scales its EM): ONE Spark
    * job aggregates the pair table down to (gamma vector → count) — at most
    * Π levels ≈ dozens of rows — then every EM iteration is a driver-side
    * loop over that table. Iteration cost is independent of pair count, so
    * the same fit runs on 10³ or 10¹² pairs. */
  def fit(gammas: DataFrame, settings: ErSettings,
      fixedU: Option[Map[String, Array[Double]]] = None): FsParams = {
    val cs = settings.comparisons
    val gcols = cs.map(c => col(s"gamma_${c.name}"))
    // the one distributed job: pattern counts
    val patterns: Array[(Array[Int], Double)] = gammas
      .groupBy(gcols: _*).agg(count(lit(1)).as("__n"))
      .collect()
      .map(r => (Array.tabulate(cs.size)(i => r.getInt(i)), r.getLong(cs.size).toDouble))
    val total = patterns.map(_._2).sum

    // init: skew m toward agreement, u toward disagreement
    def initArr(n: Int, top: Double): Array[Double] = {
      val rest = (1.0 - top) / (n - 1)
      Array.tabulate(n)(g => if (g == n - 1) top else rest)
    }
    def clamp(x: Double): Double = math.min(1 - 1e-9, math.max(1e-9, x))
    var params = FsParams(
      settings.initialLambda,
      cs.map(c => c.name -> initArr(c.numLevels, 0.9)).toMap,
      fixedU.getOrElse(
        cs.map(c => c.name -> initArr(c.numLevels, 0.9).reverse).toMap))

    var iter = 0
    var delta = Double.MaxValue
    while (iter < settings.maxIter && delta > settings.tol) {
      // E-step: P(match | gamma pattern), weighted by pattern count.
      // Per-column masses are restricted to patterns where that column's
      // gamma is observed (>= 0): null levels contribute nothing to the
      // accumulators, so normalizing by the global sumP would deflate m/u
      // away from summing to 1 whenever nulls are present (the bias splink
      // avoids by normalizing over non-null comparisons only).
      var sumP = 0.0
      val mAcc = cs.map(c => c.name -> new Array[Double](c.numLevels)).toMap
      val uAcc = cs.map(c => c.name -> new Array[Double](c.numLevels)).toMap
      val mMass = scala.collection.mutable.Map(cs.map(c => c.name -> 0.0): _*)
      val uMass = scala.collection.mutable.Map(cs.map(c => c.name -> 0.0): _*)
      patterns.foreach { case (gvec, n) =>
        var a = params.lambda
        var b = 1.0 - params.lambda
        cs.zipWithIndex.foreach { case (c, i) =>
          val g = gvec(i)
          if (g >= 0) { a *= params.m(c.name)(g); b *= params.u(c.name)(g) }
        }
        val p = a / (a + b)
        sumP += n * p
        cs.zipWithIndex.foreach { case (c, i) =>
          val g = gvec(i)
          if (g >= 0) {
            mAcc(c.name)(g) += n * p; uAcc(c.name)(g) += n * (1 - p)
            mMass(c.name) += n * p; uMass(c.name) += n * (1 - p)
          }
        }
      }
      // M-step (an all-null column has zero observed mass — keep it neutral
      // rather than dividing by zero). The isotonic pass runs LAST — after
      // clamping — because it preserves array sums exactly, so the final
      // per-column m/u ratios are non-decreasing in the gamma level with no
      // later adjustment that could reintroduce a violation.
      def safe(x: Double): Double = if (x > 0) x else 1.0
      val ordered = cs.map { c =>
        val m = mAcc(c.name).map(x => clamp(x / safe(mMass(c.name))))
        fixedU match {
          // fixed-u mode: u never moves; monotonize m alone against the
          // fixed u (same PAV pooling, m-only redistribution)
          case Some(fu) => c.name -> (isotonicAgainstFixedU(m, fu(c.name)), fu(c.name))
          case None =>
            val u = uAcc(c.name).map(x => clamp(x / safe(uMass(c.name))))
            c.name -> isotonic(m, u)
        }
      }.toMap
      val newM = cs.map(c => c.name -> ordered(c.name)._1).toMap
      val newU = cs.map(c => c.name -> ordered(c.name)._2).toMap
      val newParams = FsParams(clamp(sumP / total), newM, newU)
      delta = math.abs(newParams.lambda - params.lambda) +
        cs.map(c =>
          (newParams.m(c.name) zip params.m(c.name)).map(t => math.abs(t._1 - t._2)).max max
            (newParams.u(c.name) zip params.u(c.name)).map(t => math.abs(t._1 - t._2)).max).max
      params = newParams
      iter += 1
    }
    params
  }

  /** Per-gamma-pattern diagnostics over a scored output: pair count, plus
    * EM-sanity assertions — the fitted match probability is constant within
    * a pattern (it is a function of the gamma vector only), lies strictly
    * inside (0, 1), and is monotone non-decreasing in every gamma
    * coordinate (more agreement never lowers the match probability — a
    * *guarantee* of the isotonic M-step in [[fit]], not an empirical
    * property of any particular data; the -1 null level carries no
    * information and is excluded from the monotonicity chain). This is the
    * oracle-checkable face of the EM fit:
    * the pattern counts are engine-comparable SQL, and any EM regression
    * flips an assertion column. */
  def patternSummary(scored: DataFrame, comparisons: Seq[ComparisonColumn]): DataFrame = {
    val gcols = comparisons.map(c => col(s"gamma_${c.name}"))
    // the pattern table is tiny (Π levels); checkpoint so the per-column
    // monotonicity self-joins don't re-run the scored pipeline
    val pat = scored.groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_pairs"),
        min("match_probability").as("__pmin"),
        max("match_probability").as("__pmax"))
      .localCheckpoint()
    val base = pat
      .withColumn("prob_constant", col("__pmin") === col("__pmax"))
      // closed bounds: on strongly-separated corpora the u-product can
      // underflow so far that p rounds to exactly 1.0 in doubles
      .withColumn("prob_in_unit", col("__pmin") >= 0 && col("__pmax") <= 1)
    comparisons.foldLeft(base) { (d, c) =>
      val lower = pat.select(
        comparisons.map(cc => col(s"gamma_${cc.name}").as(s"__l_${cc.name}")) :+
          col("__pmax").as("__plower"): _*)
      val cond = comparisons.map { cc =>
        if (cc.name == c.name)
          col(s"gamma_${cc.name}") === col(s"__l_${cc.name}") + 1 &&
            col(s"__l_${cc.name}") >= 0
        else col(s"gamma_${cc.name}") === col(s"__l_${cc.name}")
      }.reduce(_ && _)
      d.join(lower, cond, "left_outer")
        // the isotonic M-step makes monotonicity exact in real arithmetic;
        // the 1e-9 slack only absorbs last-ulp rounding when pooled levels
        // share a likelihood ratio but not identical m/u values
        .withColumn(s"monotone_${c.name}",
          coalesce(col("__pmin") >= col("__plower") - lit(1e-9), lit(true)))
        .drop(comparisons.map(cc => s"__l_${cc.name}") :+ "__plower": _*)
    }
      .select(gcols ++ Seq(col("n_pairs"), col("prob_constant"), col("prob_in_unit")) ++
        comparisons.map(c => col(s"monotone_${c.name}")): _*)
      .orderBy(gcols: _*)
  }

  /** Estimate u (P(gamma level | non-match)) from random pairs — splink's
    * `estimate_u` workflow: almost all random pairs are non-matches, so the
    * observed gamma-level distribution over a random pair sample IS u. The
    * sample is two independent `sample()` passes sized so their product
    * stays near `targetPairs` — bounded work at any corpus size. */
  def estimateU(df: DataFrame, settings: ErSettings,
      targetPairs: Long = 1000000L, seed: Int = 42): Map[String, Array[Double]] = {
    val uid = settings.uniqueId
    val n = df.count().toDouble
    val f = math.min(1.0, math.sqrt(targetPairs.toDouble) / n)
    val outCols =
      df.columns.map(c => col(s"l.$c").as(s"${c}_l")) ++
        df.columns.map(c => col(s"r.$c").as(s"${c}_r"))
    val pairs = df.sample(f, seed).as("l")
      .join(df.sample(f, seed + 1).as("r"), col(s"l.$uid") < col(s"r.$uid"))
      .select(outCols.toIndexedSeq: _*)
    val gammas = Comparison.withGammas(pairs, settings.comparisons)
    val aggs = settings.comparisons.flatMap { c =>
      (0 until c.numLevels).map { g =>
        sum(when(col(s"gamma_${c.name}") === g, 1.0).otherwise(0.0)).as(s"u_${c.name}_$g")
      }
    }
    val row = gammas.agg(aggs.head, aggs.tail: _*).head()
    settings.comparisons.map { c =>
      val counts = Array.tabulate(c.numLevels)(g => row.getAs[Double](s"u_${c.name}_$g"))
      val total = math.max(1.0, counts.sum)
      c.name -> counts.map(x => math.max(1e-9, x / total))
    }.toMap
  }

  /** Score pairs with fitted params: `match_probability` plus `match_weight`
    * (log2 Bayes factor). Term-frequency adjustment: for exact matches on a
    * TF column, u is replaced by the observed frequency of the shared value
    * (common values are weaker evidence), via a broadcast join against the
    * per-value frequency table — splink's `term_frequency_adjustments`. */
  def score(
      gammas: DataFrame,
      settings: ErSettings,
      params: FsParams,
      source: Option[DataFrame] = None): DataFrame = {
    val cs = settings.comparisons
    val withTf = cs.filter(_.termFrequency).foldLeft(gammas) { (d, c) =>
      val src = source.getOrElse(
        throw new IllegalArgumentException("termFrequency requires the source DataFrame"))
      val tf = src.groupBy(col(c.name).as(s"${c.name}_l"))
        .agg((count(lit(1)) / lit(src.count().toDouble)).as(s"__tf_${c.name}"))
      d.join(broadcast(tf), Seq(s"${c.name}_l"), "left_outer")
    }
    val mProd = cs.map(c => levelProb(col(s"gamma_${c.name}"), params.m(c.name))).reduce(_ * _)
    val uProd = cs.map { c =>
      val base = levelProb(col(s"gamma_${c.name}"), params.u(c.name))
      if (c.termFrequency)
        when(col(s"gamma_${c.name}") === c.exactLevel,
          greatest(coalesce(col(s"__tf_${c.name}"), lit(1e-9)), lit(1e-9)))
          .otherwise(base)
      else base
    }.reduce(_ * _)
    val a = lit(params.lambda) * mProd
    val b = lit(1.0 - params.lambda) * uProd
    withTf
      .withColumn("match_probability", a / (a + b))
      .withColumn("match_weight", log2((lit(params.lambda) * mProd) / (lit(1.0 - params.lambda) * uProd)))
      .drop(cs.filter(_.termFrequency).map(c => s"__tf_${c.name}"): _*)
  }
}

/** The end-to-end operator the reference calls
  * `Splink(settings, df, spark).get_scored_comparisons()` (`:57-58`). */
object EntityResolver {
  /** `materializePairs`: the pair pipeline is consumed twice (the EM fit's
    * one aggregate job, then the scored output). The default recomputes it
    * — at 10¹²-pair scale materializing the pair table costs more than the
    * second pass. Set `true` at interactive/medium scale to checkpoint the
    * gamma table once and read it twice instead (blocks are released by the
    * ContextCleaner when the result is unreferenced, so nothing leaks). */
  def scoredComparisons(df: DataFrame, settings: ErSettings,
      materializePairs: Boolean = false): (DataFrame, FsParams) = {
    val pipeline = Comparison.withGammas(Blocking.pairs(df, settings), settings.comparisons)
    val gammas = if (materializePairs) pipeline.localCheckpoint() else pipeline
    // fixed-u workflow (ErSettings.fixUFromRandomPairs): u from an unbiased
    // random-pair sample, EM moves only m and lambda
    val fixedU =
      if (settings.fixUFromRandomPairs)
        Some(FellegiSunter.estimateU(df, settings, settings.uTargetPairs))
      else None
    val params = FellegiSunter.fit(gammas, settings, fixedU)
    val scored = FellegiSunter.score(gammas, settings, params, Some(df))
    (scored, params)
  }

  /** Entity clusters from pairwise predictions — splink's
    * `cluster_pairwise_predictions_at_threshold` surface, the step that
    * turns scored pairs into entity ids: connected components over the
    * pairs passing `predicate` (a probability threshold, or a gamma rule
    * when the caller wants an EM-free deterministic clustering), every
    * source record assigned `cluster_id = min(member uid)`, records in no
    * passing pair forming singleton clusters. Scale shape: one filter on
    * the (already blocked, never O(n²)) pair table, then
    * [[graft.graph.ConnectedComponents]]'s O(log n)-round loop. */
  def clusterPairs(source: DataFrame, pairs: DataFrame, uniqueId: String,
      predicate: Column, checkpointDir: Option[String] = None): DataFrame = {
    val edges = pairs.where(predicate)
      .select(col(s"${uniqueId}_l").as("src"), col(s"${uniqueId}_r").as("dst"))
    val assign = graft.graph.ConnectedComponents
      .runOnEdges(edges, checkpointDir = checkpointDir)
      .withColumnRenamed("id", uniqueId)
    source.select(col(uniqueId)).distinct()
      .join(assign, Seq(uniqueId), "left_outer")
      .select(col(uniqueId),
        coalesce(col("component"), col(uniqueId)).as("cluster_id"))
  }

  /** Fitted parameters as a DataFrame (the reference's model diagnostics
    * surface, `03_aml_entity_resolution.py:72-75`). */
  def paramsAsDataFrame(spark: org.apache.spark.sql.SparkSession, params: FsParams): DataFrame = {
    import spark.implicits._
    params.m.keys.toSeq.sorted.flatMap { c =>
      params.m(c).indices.map { g =>
        (c, g, params.m(c)(g), params.u(c)(g), params.m(c)(g) / params.u(c)(g))
      }
    }.toDF("comparison", "gamma_level", "m", "u", "bayes_factor")
  }
}
