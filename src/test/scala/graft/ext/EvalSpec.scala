package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvalSpec extends SparkTestBase {
  import spark.implicits._

  // ---------- auc ----------

  private def aucOf(rows: Seq[(Double, Boolean)], parts: Int = 1): Double = {
    val df = rows.toDF("score", "label").repartition(parts)
    Eval.auc(df, col("score"), col("label"))
      .select("auc").as[Double].collect().head
  }

  test("auc: perfect separation is 1.0, inverted is 0.0") {
    val sep = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
    assert(aucOf(sep) == 1.0)
    assert(aucOf(sep.map { case (s, l) => (s, !l) }) == 0.0)
  }

  test("auc: all scores tied gives 0.5 (midrank correction)") {
    assert(aucOf(Seq((1.0, true), (1.0, true), (1.0, false), (1.0, false))) == 0.5)
  }

  test("auc: hand-computed value with partial ties") {
    // pos scores {3, 2}, neg scores {2, 1}:
    //   pos@3 beats both negs            = 2
    //   pos@2 beats neg@1, ties neg@2    = 1.5
    // AUC = 3.5 / (2*2) = 0.875
    val rows = Seq((3.0, true), (2.0, true), (2.0, false), (1.0, false))
    assert(aucOf(rows) == 0.875)
  }

  test("auc: partitioning-invariant and matches driver-side computation") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(20).toDouble, rnd.nextBoolean()))
    // reference: O(P*N) pair loop on the driver
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val wins = (for (p <- pos; q <- neg)
      yield if (p > q) 1.0 else if (p == q) 0.5 else 0.0).sum
    val expected = wins / (pos.size.toDouble * neg.size)
    assert(math.abs(aucOf(rows, parts = 1) - expected) < 1e-12)
    assert(aucOf(rows, parts = 7) == aucOf(rows, parts = 1))
  }

  test("auc: degenerate single-class input yields null auc, correct counts") {
    val df = Seq((1.0, true), (2.0, true)).toDF("score", "label")
    val row = Eval.auc(df, col("score"), col("label")).collect().head
    assert(row.getLong(0) == 2 && row.getLong(1) == 0 && row.isNullAt(2))
  }

  test("calibrationBins: hand-computed bins with edge clamping") {
    // [0, 100) in 4 bins of width 25; scores -5 and 120 clamp to bins 0, 3
    val df = Seq(
      (-5L, false), (10L, false), (30L, true), (40L, false),
      (80L, true), (90L, true), (120L, true)).toDF("score", "label")
    val got = Eval.calibrationBins(df, col("score"), col("label"), 0L, 100L, 4)
      .select("bin", "n", "pos", "frac_pos", "mean_score")
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(0L) == ((2L, 0L, 0.0, 2.5)))        // -5 (clamped), 10
    assert(got(1L) == ((2L, 1L, 0.5, 35.0)))       // 30, 40
    assert(got(3L) == ((3L, 3L, 1.0, 290.0 / 3)))  // 80, 90, 120 (clamped)
    assert(!got.contains(2L)) // empty bin emits no row
  }

  // ---------- recallAtK ----------

  test("recallAtK: counts overlap per query, keeps zero-hit queries") {
    val exact = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 20L, 1L), (2L, 21L, 2L), (2L, 22L, 3L)).toDF("query_id", "neighbor_id", "rank")
    val approx = Seq(
      (1L, 10L, 1L), (1L, 99L, 2L), (1L, 12L, 3L),
      (2L, 98L, 1L), (2L, 97L, 2L), (2L, 96L, 3L)).toDF("query_id", "neighbor_id", "rank")
    val hits = Eval.recallAtK(exact, approx, "query_id", "neighbor_id", 3)
      .select("query_id", "hits").as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 2L, 2L -> 0L))
    val recall = Eval.recallAtK(exact, approx, "query_id", "neighbor_id", 3)
      .select("query_id", "recall").as[(Long, Double)].collect().toMap
    assert(recall(1L) == 2.0 / 3 && recall(2L) == 0.0)
  }

  test("recallAtK: rows ranked beyond k are ignored on both sides") {
    val exact = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 66L, 9L))
      .toDF("query_id", "neighbor_id", "rank")
    val approx = Seq((1L, 11L, 1L), (1L, 10L, 7L))
      .toDF("query_id", "neighbor_id", "rank")
    val row = Eval.recallAtK(exact, approx, "query_id", "neighbor_id", 2)
      .select("exact_k", "hits").as[(Long, Long)].collect().head
    assert(row == ((2L, 1L))) // 66 (rank 9) excluded; 10 present only at rank 7
  }

  test("recallAtK: identical ANN arms give recall 1 on real operators") {
    val rnd = new scala.util.Random(7)
    val emb = Seq.tabulate(60)(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val qs = emb.filter(col("vec_id") < 4)
    val brute = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3)
    val rec = Eval.recallAtK(brute, brute, "query_id", "neighbor_id", 3)
      .select("recall").as[Double].collect()
    assert(rec.length == 4 && rec.forall(_ == 1.0))
  }

  // ---------- sourceOverlap ----------

  test("sourceOverlap: shared shingles and jaccard per source pair") {
    val docs = Seq(
      (1L, "a", "one two three four five six"),
      (2L, "a", "completely different text in source a here"),
      (3L, "b", "one two three four five seven"), // shares 2 trigram-rows with doc 1? use n=3
      (4L, "c", "nothing in common with anyone else at all")
    ).toDF("doc_id", "source", "text")
    val got = Eval.sourceOverlap(docs, "source", "text", n = 3)
      .select("source_l", "source_r", "common", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // source a trigram set: docs 1 (6 words -> 4) + 2 (7 words -> 5) = 9
    // distinct shingles; source b: 4 shingles; shared with a: "one two
    // three", "two three four", "three four five" = 3; jaccard = 3/(9+4-3)
    assert(got.keySet == Set(("a", "b")))
    assert(got(("a", "b")) == ((3L, 3.0 / 10)))
  }

  test("sourceOverlap: fan-out bounded — identical boilerplate across all sources") {
    // one shingle shared by many docs in 3 sources collapses to 3 index rows
    val docs = (1 to 30).map(i => (i.toLong, s"s${i % 3}", "same exact boiler plate text"))
      .toDF("doc_id", "source", "text")
    val got = Eval.sourceOverlap(docs, "source", "text", n = 5)
      .select("source_l", "source_r", "common", "jaccard")
      .as[(String, String, Long, Double)].collect()
    assert(got.length == 3) // 3 choose 2 pairs
    assert(got.forall(r => r._3 == 1L && r._4 == 1.0))
  }
}
