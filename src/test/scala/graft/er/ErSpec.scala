package graft.er

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.JaroWinklerAlgo

class JaroWinklerSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double = JaroWinklerAlgo.similarity(a, b)

  test("classic published values (Winkler 1990)") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611) < 1e-3)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133) < 1e-3)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-3)
  }

  test("bounds and identities") {
    assert(jw("abc", "abc") == 1.0)
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("abc", "xyz") == 0.0)
    assert(jw("prefix_common", "prefix_other") > jw("common_prefix", "other_prefix"))
  }

  test("SQL function via GraftExtensions, codegen path") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"), (null, "x"))
      .toDF("a", "b")
    val got = df.select(call_function("jaro_winkler", col("a"), col("b"))).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611) < 1e-3)
    assert(math.abs(got(1).getDouble(0) - 0.8133) < 1e-3)
    assert(got(2).isNullAt(0)) // null-safe
    val viaSql = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA')").head().getDouble(0)
    assert(math.abs(viaSql - 0.9611) < 1e-3)
  }
}

class FellegiSunterSpec extends SparkTestBase {
  import spark.implicits._

  private val settings = ErSettings(
    uniqueId = "unique_id",
    blockingRules = Seq("l.block = r.block"),
    comparisons = Seq(
      ComparisonColumn("name", fuzzy = Some(LevenshteinLevel(1))),
      ComparisonColumn("amount")))

  // 4 true duplicate pairs (same name & amount) + noise records per block
  private def df = Seq(
    (1L, "alice", 100.0, 1L), (2L, "alice", 100.0, 1L), (3L, "zed", 55.0, 1L),
    (4L, "bob", 200.0, 2L), (5L, "bob", 200.0, 2L), (6L, "kim", 77.0, 2L),
    (7L, "carol", 300.0, 3L), (8L, "carol", 300.0, 3L), (9L, "dan", 42.0, 3L),
    (10L, "erin", 400.0, 4L), (11L, "erin", 400.0, 4L), (12L, "fay", 13.0, 4L)
  ).toDF("unique_id", "name", "amount", "block")

  test("blocking generates within-block pairs, l < r, deduplicated") {
    val pairs = Blocking.pairs(df, settings)
    assert(pairs.count() == 12) // 4 blocks x C(3,2)
    assert(pairs.filter(col("unique_id_l") >= col("unique_id_r")).count() == 0)
    // multiple overlapping rules must not duplicate pairs
    val multi = Blocking.pairs(df, settings.copy(
      blockingRules = Seq("l.block = r.block", "l.amount = r.amount")))
    assert(multi.count() == 12)
  }

  test("ruleKeys: symmetric equalities parse, theta/asymmetric rejected") {
    val keys = Blocking.ruleKeys(spark,
      "l.block = r.block AND substring(l.name, 1, 2) = substring(r.name, 1, 2)")
    assert(keys.size == 2)
    // the parsed keys group df into exactly the rule's blocks
    val n = df.groupBy(keys: _*).count().count()
    assert(n == df.select(col("block"), substring(col("name"), 1, 2))
      .distinct().count())
    intercept[IllegalArgumentException] {
      Blocking.ruleKeys(spark, "l.amount < r.amount")
    }
    intercept[IllegalArgumentException] {
      Blocking.ruleKeys(spark, "l.name = r.block")
    }
  }

  test("ruleKeys: reversed-alias symmetric equality accepted (r.x = l.x)") {
    val keys = Blocking.ruleKeys(spark, "r.block = l.block")
    assert(keys.size == 1)
    assert(df.groupBy(keys: _*).count().count() == 4)
    // mixed orientation across conjuncts too
    assert(Blocking.ruleKeys(spark,
      "r.block = l.block AND l.amount = r.amount").size == 2)
    // but a same-alias tautology (typo'd rule, always true — a cross join,
    // not a block) must be rejected loudly, not reinterpreted as a key
    intercept[IllegalArgumentException] {
      Blocking.ruleKeys(spark, "l.block = l.block")
    }
    intercept[IllegalArgumentException] {
      Blocking.ruleKeys(spark, "r.block = r.block")
    }
  }

  test("blockStats excludes NULL-keyed rows (the join emits no pairs for them)") {
    // two null-block rows would form a 2-row "block" under groupBy (which
    // groups nulls), but the rule's equi-join never matches NULL = NULL —
    // the predicted pair count must not include them
    val withNulls = df.unionByName(Seq(
        (100L, "nan", 1.0, Option.empty[Long]),
        (101L, "nan2", 1.0, Option.empty[Long]))
      .toDF("unique_id", "name", "amount", "block"))
    val one = settings.copy(blockingRules = Seq("l.block = r.block"))
    val stats = Blocking.blockStats(withNulls, one)
      .as[(Long, Long, Long, Double, Long)].head()
    assert(stats == ((1L, 4L, 3L, 3.0, 12L))) // identical to the null-free df
    // and matches the rule join's actual pre-dedup output on the dirty data
    assert(stats._5 == Blocking.pairs(withNulls, one).count())
  }

  test("blockStats: counts, max/p99, exact pair prediction per rule") {
    val stats = Blocking.blockStats(df, settings.copy(
        blockingRules = Seq("l.block = r.block", "l.amount = r.amount")))
      .orderBy("rule_idx")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    // rule 1: 4 blocks of 3 → max 3, pairs 4·C(3,2)=12
    assert(stats.head == ((1L, 4L, 3L, 3.0, 12L)))
    // rule 2: amounts 100/200/300/400 pair up (4 blocks of 2), 4 singletons
    assert(stats(1) == ((2L, 8L, 2L, 2.0, 4L)))
    // the prediction equals the rule join's actual pre-dedup output
    val actual = Blocking.pairs(df,
      settings.copy(blockingRules = Seq("l.block = r.block"))).count()
    assert(stats.head._5 == actual)
  }

  test("maxBlockSize purges oversized blocks per rule, others unaffected") {
    val capped = settings.copy(
      blockingRules = Seq("l.block = r.block", "l.amount = r.amount"),
      maxBlockSize = Some(2))
    val pairs = Blocking.pairs(df, capped)
    // every size-3 block is purged under rule 1 (0 pairs); rule 2's
    // size-2 amount blocks survive → exactly the 4 same-amount pairs
    assert(pairs.count() == 4)
    assert(pairs.filter(col("name_l") =!= col("name_r")).count() == 0)
    // cap high enough to keep everything == exact uncapped semantics
    val loose = Blocking.pairs(df, capped.copy(maxBlockSize = Some(3)))
      .select("unique_id_l", "unique_id_r").collect().toSet
    val exact = Blocking.pairs(df, capped.copy(maxBlockSize = None))
      .select("unique_id_l", "unique_id_r").collect().toSet
    assert(loose == exact)
  }

  test("unlinkables: records with zero candidate pairs, exact share") {
    // blocks of size 1 strand their record; multi-rule coverage counts a
    // record linked if ANY rule pairs it
    val d = Seq(
      (1L, "a", 9.0, 1L), (2L, "a", 8.0, 1L), // block 1: linked
      (3L, "b", 7.0, 2L),                     // alone in block 2...
      (4L, "c", 7.0, 3L),                     // ...but amount ties 3-4
      (5L, "d", 1.0, 4L), (6L, "e", 2.0, 5L)  // unlinkable under both rules
    ).toDF("unique_id", "name", "amount", "block")
    val got = Blocking.unlinkables(d, settings.copy(
        blockingRules = Seq("l.block = r.block", "l.amount = r.amount")))
      .as[(Long, Long, Double)].head()
    assert(got == ((6L, 2L, 2.0 / 6.0)))
  }

  test("gamma levels: exact=top, fuzzy=middle, disagree=0, null=-1") {
    val d = Seq(
      (1L, "abc", 2L, "abc"),   // exact -> 2
      (3L, "abc", 4L, "abd"),   // lev 1 -> 1
      (5L, "abc", 6L, "xyz"),   // -> 0
      (7L, null.asInstanceOf[String], 8L, "abc") // -> -1
    ).toDF("unique_id_l", "name_l", "unique_id_r", "name_r")
    val g = Comparison.withGammas(d, Seq(settings.comparisons.head))
      .orderBy("unique_id_l")
      .select("gamma_name").as[Int].collect().toSeq
    assert(g == Seq(2, 1, 0, -1))
  }

  test("numeric-tolerance and soundex fuzzy levels") {
    val d = Seq(
      (1L, 100.0, "robert", 2L, 100.0, "robert"),   // exact both
      (3L, 100.0, "robert", 4L, 100.4, "rupert"),   // within tol; same soundex R163
      (5L, 100.0, "robert", 6L, 150.0, "alice")     // disagree both
    ).toDF("unique_id_l", "amount_l", "name_l", "unique_id_r", "amount_r", "name_r")
    val cs = Seq(
      ComparisonColumn("amount", fuzzy = Some(NumericToleranceLevel(0.5))),
      ComparisonColumn("name", fuzzy = Some(SoundexLevel)))
    val g = Comparison.withGammas(d, cs).orderBy("unique_id_l")
      .select("gamma_amount", "gamma_name").as[(Int, Int)].collect().toSeq
    assert(g == Seq((2, 2), (1, 1), (0, 0)))
  }

  test("double-metaphone fuzzy level: phonetic variants agree, strangers do not") {
    // codegen'd SQL function matches commons-codec directly
    val enc = new org.apache.commons.codec.language.DoubleMetaphone
    val names = Seq("smith", "smyth", "catherine", "kathryn", "jones", "alice")
    val viaSql = names.toDF("s")
      .selectExpr("double_metaphone(s)", "double_metaphone_alt(s)")
      .as[(String, String)].collect().toSeq
    assert(viaSql == names.map(n =>
      (enc.doubleMetaphone(n), enc.doubleMetaphone(n, true))))

    val d = Seq(
      (1L, "smith", 2L, "smith"),      // exact
      (3L, "smith", 4L, "smyth"),      // phonetic variant -> fuzzy level
      (5L, "catherine", 6L, "kathryn"),// phonetic variant -> fuzzy level
      (7L, "smith", 8L, "alice"),      // disagree
      (9L, null.asInstanceOf[String], 10L, "smith") // null -> -1
    ).toDF("unique_id_l", "name_l", "unique_id_r", "name_r")
    val cs = Seq(ComparisonColumn("name", fuzzy = Some(DoubleMetaphoneLevel())))
    val g = Comparison.withGammas(d, cs).orderBy("unique_id_l")
      .select("gamma_name").as[Int].collect().toSeq
    assert(g == Seq(2, 1, 1, 0, -1))

    // includeAlternate only widens the match set
    val csAlt = Seq(ComparisonColumn("name",
      fuzzy = Some(DoubleMetaphoneLevel(includeAlternate = true))))
    val gAlt = Comparison.withGammas(d, csAlt).orderBy("unique_id_l")
      .select("gamma_name").as[Int].collect().toSeq
    assert(g.zip(gAlt).forall { case (a, b) => b >= a || a == 2 },
      s"alternate must not lose matches: $g vs $gAlt")
  }

  test("EM separates true duplicates from noise pairs") {
    val (scored, params) = EntityResolver.scoredComparisons(df, settings)
    val byPair = scored
      .select("unique_id_l", "unique_id_r", "match_probability")
      .as[(Long, Long, Double)].collect()
      .map { case (l, r, p) => (l, r) -> p }.toMap
    val dupPairs = Seq((1L, 2L), (4L, 5L), (7L, 8L), (10L, 11L))
    val noisePairs = byPair.keySet -- dupPairs
    val minDup = dupPairs.map(byPair).min
    val maxNoise = noisePairs.map(byPair).max
    assert(minDup > 0.9, s"true-duplicate probability too low: $minDup")
    assert(maxNoise < 0.5, s"noise-pair probability too high: $maxNoise")
    // fitted m should put most match mass on the exact level
    assert(params.m("name").last > 0.9)
    // monotonicity: full agreement beats partial agreement
    assert(minDup > byPair.filter { case ((l, r), _) => noisePairs((l, r)) }.values.max)
  }

  test("match_weight is log2 of the Bayes factor and ranks with probability") {
    val (scored, _) = EntityResolver.scoredComparisons(df, settings)
    val rows = scored.select("match_probability", "match_weight")
      .as[(Double, Double)].collect().sortBy(_._1)
    val ws = rows.map(_._2)
    assert(ws.zip(ws.tail).forall { case (a, b) => a <= b + 1e-12 })
  }

  test("u estimated from random pairs puts its mass on disagreement") {
    // 60 rows with structurally distinct names: a random pair almost never
    // agrees exactly, rarely even fuzzily
    val big = (1L to 60L).map(i =>
      (i, s"entity_${i * 2654435761L % 99991}_${"x" * (i % 7).toInt}", i * 10.0, i % 5)
    ).toDF("unique_id", "name", "amount", "block")
    val u = FellegiSunter.estimateU(big, settings, targetPairs = 500)
    assert(u("name")(0) > 0.6, s"u(name) = ${u("name").toSeq}")
    assert(u("name").last < 0.05)
    assert(u("amount")(0) > 0.9)
  }

  test("fitted params export as a diagnostics DataFrame with Bayes factors") {
    val (_, params) = EntityResolver.scoredComparisons(df, settings)
    val diag = EntityResolver.paramsAsDataFrame(spark, params)
    assert(diag.columns.toSeq ==
      Seq("comparison", "gamma_level", "m", "u", "bayes_factor"))
    val rows = diag.as[(String, Int, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSet == Set("name", "amount"))
    rows.foreach { case (_, _, m, u, bf) => assert(math.abs(bf - m / u) < 1e-12) }
    // agreement on the top level must be evidence FOR a match after the fit
    assert(rows.filter(r => r._1 == "name" && r._2 == 2).head._5 > 1.0)
  }

  test("EM with null gammas keeps per-column m/u normalized over observed levels") {
    // null names on the noise records: their gamma_name is -1, which must
    // not deflate the name column's m/u normalization
    val withNulls = df.withColumn("name",
      when(col("unique_id").isin(3L, 6L, 9L), lit(null: String))
        .otherwise(col("name")))
    val (_, params) = EntityResolver.scoredComparisons(withNulls, settings)
    for (c <- Seq("name", "amount")) {
      assert(math.abs(params.m(c).sum - 1.0) < 1e-6, s"m($c)=${params.m(c).toSeq}")
      assert(math.abs(params.u(c).sum - 1.0) < 1e-6, s"u($c)=${params.u(c).toSeq}")
    }
  }

  test("isotonic M-step: ratios ordered, masses and sums preserved, sorted input untouched") {
    // violating input: level-1 ratio dips below level 0's
    val m = Array(0.5, 0.1, 0.4)
    val u = Array(0.2, 0.5, 0.3)
    val (mi, ui) = FellegiSunter.isotonic(m, u)
    assert(math.abs(mi.sum - m.sum) < 1e-12 && math.abs(ui.sum - u.sum) < 1e-12)
    m.indices.foreach(i =>
      assert(math.abs(mi(i) + ui(i) - (m(i) + u(i))) < 1e-12, "per-level mass"))
    val ratios = mi.zip(ui).map { case (a, b) => a / b }
    assert(ratios.sliding(2).forall(p => p.head <= p.last + 1e-12), ratios.toSeq.toString)
    // already-ordered input passes through unchanged
    val (m2, u2) = FellegiSunter.isotonic(Array(0.1, 0.9), Array(0.9, 0.1))
    assert(m2.toSeq == Seq(0.1, 0.9) && u2.toSeq == Seq(0.9, 0.1))
    // fitted params are ratio-ordered even on adversarial mid-level data:
    // the fuzzy level here is pure noise relative to exact agreement
    val (_, params) = EntityResolver.scoredComparisons(df, settings)
    for (c <- settings.comparisons) {
      val rs = params.m(c.name).zip(params.u(c.name)).map { case (a, b) => a / b }
      assert(rs.sliding(2).forall(p => p.head <= p.last + 1e-9),
        s"${c.name}: ${rs.toSeq}")
    }
  }

  test("patternSummary: SQL-comparable counts plus EM-law assertions all hold") {
    val (scored, _) = EntityResolver.scoredComparisons(df, settings)
    val summary = FellegiSunter.patternSummary(scored, settings.comparisons)
    assert(summary.columns.toSeq == Seq("gamma_name", "gamma_amount", "n_pairs",
      "prob_constant", "prob_in_unit", "monotone_name", "monotone_amount"))
    val rows = summary.as[(Int, Int, Long, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(rows.map(_._3).sum == scored.count())
    rows.foreach { r =>
      assert(r._4 && r._5 && r._6 && r._7, s"assertion failed for pattern $r")
    }
  }

  test("salted blocking: identical pair set, hot-key pairs spread over many tasks") {
    // adversarial skew: 90% of rows share one amount — the classic hot
    // round-number transaction value (reference 03_aml_entity_resolution.py
    // blocks on amount equality)
    val hot = (1L to 200L).map(i =>
      (i, s"name$i", if (i <= 180) 42.0 else i.toDouble, i % 7))
      .toDF("unique_id", "name", "amount", "block")
    val st = settings.copy(blockingRules = Seq("l.amount = r.amount"))
    val plain = Blocking.pairs(hot, st)
      .select("unique_id_l", "unique_id_r").as[(Long, Long)].collect().toSet
    val salted = Blocking.pairs(hot, st.copy(blockingSalt = Some(8)))
      .select("unique_id_l", "unique_id_r").as[(Long, Long)].collect().toSet
    // salting must never change the generated pair set
    assert(salted == plain)
    assert(plain.size == 180L * 179 / 2)

    // per-task bound on the pre-dedup rule join: force the shuffle path
    // (no broadcast, no AQE coalescing, enough partitions to spread into)
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "16")
      def maxTaskPairs(s2: ErSettings): Long = Blocking
        .rulePairs(hot, s2, "l.amount = r.amount")
        .select(spark_partition_id().as("pid"))
        .groupBy("pid").count().agg(max("count")).as[Long].head()
      val plainMax = maxTaskPairs(st)
      val saltedMax = maxTaskPairs(st.copy(blockingSalt = Some(8)))
      // unsalted: every hot pair lands in ONE task (~16110); salted: spread
      // across the 8 (amount, salt) sub-keys
      assert(plainMax >= 180L * 179 / 2, s"expected one hot task, got $plainMax")
      assert(saltedMax < plainMax / 3,
        s"salting did not spread the hot key: $saltedMax vs $plainMax")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("fixed-u workflow: u pinned from random pairs, EM still separates dups") {
    val stFixed = settings.copy(fixUFromRandomPairs = true, uTargetPairs = 500L)
    val (scored, params) = EntityResolver.scoredComparisons(df, stFixed)
    // u is exactly the standalone random-pair estimate — EM never moved it
    val u = FellegiSunter.estimateU(df, settings, targetPairs = 500L)
    for (c <- settings.comparisons)
      assert(params.u(c.name).toSeq == u(c.name).toSeq,
        s"u(${c.name}) moved: ${params.u(c.name).toSeq} vs ${u(c.name).toSeq}")
    // the m-only fit still separates true duplicates from noise
    val byPair = scored.select("unique_id_l", "unique_id_r", "match_probability")
      .as[(Long, Long, Double)].collect().map { case (l, r, p) => (l, r) -> p }.toMap
    val dupPairs = Seq((1L, 2L), (4L, 5L), (7L, 8L), (10L, 11L))
    val minDup = dupPairs.map(byPair).min
    val maxNoise = (byPair.keySet -- dupPairs).map(byPair).max
    assert(minDup > 0.9, s"true-duplicate probability too low: $minDup")
    assert(maxNoise < 0.5, s"noise-pair probability too high: $maxNoise")
    // the monotone-ratio guarantee survives the m-only isotonic pass
    for (c <- settings.comparisons) {
      val rs = params.m(c.name).zip(params.u(c.name)).map { case (a, b) => a / b }
      assert(rs.sliding(2).forall(p => p.head <= p.last + 1e-9), s"${c.name}: ${rs.toSeq}")
    }
  }

  test("isotonicAgainstFixedU: u untouched, block m-mass preserved, ratios ordered") {
    val m = Array(0.9, 0.05)
    val u = Array(0.001, 0.9)
    val mi = FellegiSunter.isotonicAgainstFixedU(m, u)
    assert(math.abs(mi.sum - m.sum) < 1e-12, "total m mass preserved")
    val ratios = mi.zip(u).map { case (a, b) => a / b }
    assert(ratios.sliding(2).forall(p => p.head <= p.last + 1e-12), ratios.toSeq.toString)
    // already-ordered input passes through unchanged
    val mOk = FellegiSunter.isotonicAgainstFixedU(Array(0.1, 0.9), Array(0.9, 0.1))
    assert(mOk.toSeq == Seq(0.1, 0.9))
  }

  test("term-frequency adjustment weakens matches on common values") {
    val tfDf = Seq(
      (1L, "smith", 1L), (2L, "smith", 1L), (3L, "smith", 2L), (4L, "smith", 2L),
      (5L, "rare", 3L), (6L, "rare", 3L), (7L, "x", 4L), (8L, "y", 4L)
    ).toDF("unique_id", "name", "block")
    val tfSettings = ErSettings(
      uniqueId = "unique_id",
      blockingRules = Seq("l.block = r.block"),
      comparisons = Seq(ComparisonColumn("name", termFrequency = true)))
    val (scored, _) = EntityResolver.scoredComparisons(tfDf, tfSettings)
    val p = scored.select("name_l", "match_probability")
      .as[(String, Double)].collect().toMap
    assert(p("rare") > p("smith"), "rare shared value must outweigh common one")
  }
}

class ClusterPairsSpec extends graft.SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("clusterPairs groups transitively matched records and leaves singletons") {
    val src = Seq(1L, 2L, 3L, 4L, 5L).toDF("unique_id")
    // 1-2 and 2-3 match (transitive cluster), 4-5 pair fails the predicate
    val pairs = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (4L, 5L, 0.2))
      .toDF("unique_id_l", "unique_id_r", "match_probability")
    val out = EntityResolver
      .clusterPairs(src, pairs, "unique_id", col("match_probability") >= 0.5)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L))
  }
}
