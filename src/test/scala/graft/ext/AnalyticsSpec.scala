package graft.ext

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.graph.LinkPrediction

/** Unit properties for the behavioral-analytics operators (q112–q118):
  * link prediction, funnels, rolling anomaly scores, market-basket lift,
  * priority sampling, EWMA, and the TF-IDF cosine join. */
class AnalyticsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  // ---------- link prediction ----------

  test("linkPrediction: hand-checked wedge scores, observed edges excluded") {
    // star around z=1: 1-2, 1-3, 1-4; plus observed edge 2-3
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L)).toDF("src", "dst")
    val got = LinkPrediction.resourceAllocation(edges, hubCap = 64, minCommon = 1)
      .orderBy("x", "y").as[(Long, Long, Long, Long)].collect()
    // candidate pairs through z=1 (deg 3): (2,3) observed → dropped;
    // (2,4), (3,4) survive with cn=1, ra_q = 1e9/3
    assert(got.toSeq == Seq(
      (2L, 4L, 1L, 333333333L), (3L, 4L, 1L, 333333333L)))
  }

  test("linkPrediction: hub cap drops wedges through high-degree centers") {
    val hub = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    val none = LinkPrediction.resourceAllocation(hub, hubCap = 10, minCommon = 1)
    assert(none.count() == 0)
    val some = LinkPrediction.resourceAllocation(hub, hubCap = 64, minCommon = 1)
    // 19 spokes → C(19,2) unobserved pairs through the hub
    assert(some.count() == 19L * 18 / 2)
  }

  test("linkPrediction: degree cap joins BELOW the collect_list aggregate") {
    // Structural regression guard for the hub-row bound: the hubCap degree
    // filter must join into the plan BEFORE the collect_list aggregate, so
    // no hub ever materializes an unbounded neighbor array mid-aggregate
    // (collect_list partials don't spill within a row). The behavioral hub
    // test above would still pass with a reverted post-aggregate filter —
    // this one fails: the aggregate would then sit directly on the edge
    // scan with no join underneath.
    import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val plan = LinkPrediction.resourceAllocation(edges, hubCap = 4, minCommon = 1)
      .queryExecution.optimizedPlan
    val collectAggs = plan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case ae: AggregateExpression =>
          ae.aggregateFunction.prettyName == "collect_list"
        case _ => false
      }) => a
    }
    assert(collectAggs.nonEmpty, "expected a collect_list aggregate in the plan")
    assert(collectAggs.forall(
      a => a.child.collect { case j: Join => j }.nonEmpty),
      "the degree-cap keep-join must be a descendant of the collect_list aggregate")
  }

  test("linkPrediction: orientation and multi-edges are normalized away") {
    val e1 = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    val e2 = Seq((2L, 1L), (3L, 1L), (3L, 1L)).toDF("src", "dst")
    val r1 = LinkPrediction.resourceAllocation(e1, minCommon = 1)
      .orderBy("x", "y").collect().toSeq
    val r2 = LinkPrediction.resourceAllocation(e2, minCommon = 1)
      .orderBy("x", "y").collect().toSeq
    assert(r1 == r2 && r1.nonEmpty)
  }

  // ---------- funnel ----------

  private val funnelEvents = Seq(
    // u1 completes a->b->c in order, within the hour
    (1L, "a", ts(0), 1L), (1L, "b", ts(10), 2L), (1L, "c", ts(20), 3L),
    // u2 does b BEFORE its first a — not a conversion
    (2L, "b", ts(0), 4L), (2L, "a", ts(10), 5L), (2L, "c", ts(20), 6L),
    // u3 converts to b only outside the window
    (3L, "a", ts(0), 7L), (3L, "b", ts(600), 8L)
  ).toDF("user_id", "event_type", "ts", "event_id")

  test("funnel: ordering and window constraints hold") {
    val got = TimeSeries.funnel(funnelEvents, Seq("a", "b", "c"),
        windowHours = 1)
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 3L, 100.0), (2L, "b", 1L, 33.33), (3L, "c", 1L, 33.33)))
  }

  test("funnel: step counts are monotonically non-increasing") {
    val users = TimeSeries.funnel(funnelEvents, Seq("a", "b"), 24)
      .orderBy("step").select("users").as[Long].collect()
    assert(users.sliding(2).forall(w => w.length < 2 || w(0) >= w(1)))
  }

  // ---------- gap-fill interpolation ----------

  test("gapFillInterpolate: hand-checked interior interpolation and edges") {
    // user 1: days 0 and 3 observed (10, 40) -> days 1,2 interpolated
    // 20, 30; user 2: single day (no gaps, no spine growth)
    def dayTs(d: Int): Timestamp =
      new Timestamp(d.toLong * 86400000L)
    val df = Seq(
      (1L, dayTs(0), 1L, 10.0), (1L, dayTs(3), 2L, 40.0),
      (2L, dayTs(5), 3L, 7.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.gapFillInterpolate(df)
      .orderBy("user_id", "day")
      .select("user_id", "day", "observed", "value")
      .as[(Long, Long, Boolean, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, true, 10.0), (1L, 1L, false, 20.0), (1L, 2L, false, 30.0),
      (1L, 3L, true, 40.0), (2L, 5L, true, 7.0)))
  }

  test("gapFillInterpolate: same-day avg rounds, no edge extrapolation") {
    def dayTs(d: Int): Timestamp = new Timestamp(d.toLong * 86400000L)
    val df = Seq(
      // day 0 has two events -> avg 1.5; day 2 observed; day 1 interp 2.25
      (1L, dayTs(0), 1L, 1.0), (1L, dayTs(0), 2L, 2.0),
      (1L, dayTs(2), 3L, 3.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.gapFillInterpolate(df)
      .orderBy("day").select("value").as[Double].collect().toSeq
    assert(got == Seq(1.5, 2.25, 3.0))
    // spine never extends past the key's own [min, max] day range
    assert(TimeSeries.gapFillInterpolate(df).count() == 3)
  }

  // ---------- Kaplan–Meier survival ----------

  test("kaplanMeier: hand-checked risk sets, censoring, and survival") {
    def dayTs(d: Int): Timestamp = new Timestamp(d.toLong * 86400000L)
    // horizon = day 10, gap 3 => churned iff last day <= 7.
    // A: span 0 (churn), B: span 5 (churn), C/D: span 10 (censored).
    val df = Seq(
      (1L, dayTs(0), 1L, 0.0),
      (2L, dayTs(0), 2L, 0.0), (2L, dayTs(5), 3L, 0.0),
      (3L, dayTs(0), 4L, 0.0), (3L, dayTs(10), 5L, 0.0),
      (4L, dayTs(0), 6L, 0.0), (4L, dayTs(10), 7L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.kaplanMeier(df, churnGapDays = 3)
      .orderBy("duration")
      .select("duration", "n_risk", "n_event", "n_censor", "survival")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // S(0) = 3/4, S(5) = 3/4 * 2/3 = 1/2, S(10) unchanged (censor only)
    assert(got == Seq(
      (0L, 4L, 1L, 0L, 0.75), (5L, 3L, 1L, 0L, 0.5), (10L, 2L, 0L, 2L, 0.5)))
  }

  test("kaplanMeier: terminal all-death factor short-circuits to 0") {
    def dayTs(d: Int): Timestamp = new Timestamp(d.toLong * 86400000L)
    // gap 0 => everyone churned; last duration kills the whole risk set
    val df = Seq(
      (1L, dayTs(0), 1L, 0.0),
      (2L, dayTs(0), 2L, 0.0), (2L, dayTs(2), 3L, 0.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.kaplanMeier(df, churnGapDays = 0)
      .orderBy("duration").select("survival").as[Double].collect().toSeq
    assert(got == Seq(0.5, 0.0))
  }

  // ---------- rolling z-score ----------

  test("rollingZScore: constant history then a spike flags only the spike") {
    val base = (1 to 10).map(i => (1L, ts(i), i.toLong, 10.0 + (i % 2)))
    val spike = Seq((1L, ts(11), 11L, 500.0))
    val df = (base ++ spike).toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.rollingZScore(df, lookback = 16, minObs = 8,
      threshold = 2.5).select("event_id").as[Long].collect()
    assert(got.toSeq == Seq(11L))
  }

  test("rollingZScore: needs minObs prior rows and nonzero variance") {
    // constant history → zero variance → never flagged, no div-by-zero
    val const = (1 to 12).map(i => (1L, ts(i), i.toLong, 7.0))
    val df = const.toDF("user_id", "ts", "event_id", "value")
    assert(TimeSeries.rollingZScore(df).count() == 0)
  }

  // ---------- ewma ----------

  test("ewmaHalf: hand-computed smoothing with alpha=1/2 weights") {
    val df = Seq((1L, ts(1), 1L, 8.0), (1L, ts(2), 2L, 4.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = TimeSeries.ewmaHalf(df, terms = 8)
      .orderBy("event_id").select("ewma").as[Double].collect()
    // row1: 8.0; row2: (4*1 + 8*0.5) / 1.5 = 5.3333
    assert(got.toSeq == Seq(8.0, 5.3333))
  }

  test("ewmaHalf: smoothed value stays within the observed range") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 50).map(i => (i.toLong % 3, ts(i), i.toLong,
      rnd.nextDouble() * 100)).toDF("user_id", "ts", "event_id", "value")
    val bad = TimeSeries.ewmaHalf(df, terms = 8)
      .where(col("ewma") < 0 || col("ewma") > 100)
    assert(bad.count() == 0)
  }

  // ---------- market basket ----------

  test("pairLift: exact supports and lift on a hand-built basket set") {
    // baskets: {1,2} {1,2} {1,3} {3}  → n=4, c1=3, c2=2, c3=2, c12=2
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L), (13L, 3L)).toDF("ok", "pk")
    val got = MarketBasket.pairLift(b, "ok", "pk", minSupport = 2)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    // lift(1,2) = 4*2/(3*2) = 1.3333
    assert(got == Seq((1L, 2L, 2L, 3L, 2L, 1.3333)))
  }

  test("pairLift: duplicate lines in one basket count once") {
    val b = Seq((10L, 1L), (10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L))
      .toDF("ok", "pk")
    val got = MarketBasket.pairLift(b, "ok", "pk", minSupport = 2)
      .select("cab").as[Long].collect()
    assert(got.toSeq == Seq(2L))
  }

  // ---------- target encoding ----------

  test("targetEncode: hand-computed m-estimate shrinkage") {
    // cat a: n=2 sum=2 (mean 1); cat b: n=1 sum=0; prior = 2/3
    val df = Seq(("a", 1L), ("a", 1L), ("b", 0L)).toDF("cat", "y")
    val got = FeatureEncoding.targetEncode(df, "cat", "y", m = 1.0)
      .orderBy("cat").as[(String, Long, Long, Double)].collect().toSeq
    val prior = 2.0 / 3.0
    assert(got == Seq(
      ("a", 2L, 2L, (2.0 + prior) / 3.0), ("b", 1L, 0L, prior / 2.0)))
  }

  test("targetEncode: rare categories shrink toward the prior") {
    val df = (1 to 100).map(i => ("big", if (i <= 90) 1L else 0L)) :+
      (("rare", 0L))
    val enc = FeatureEncoding.targetEncode(df.toDF("cat", "y"), "cat", "y",
        m = 10.0)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    val prior = 90.0 / 101.0
    // big stays near its own mean; rare lands between 0 and the prior,
    // much closer to the prior than to its raw mean
    assert(math.abs(enc("big") - 0.9) < 0.02)
    assert(enc("rare") > 0.7 * prior && enc("rare") < prior)
  }

  // ---------- item neighbors ----------

  test("itemNeighbors: cosine from supports, both directions, ranked") {
    // baskets: {1,2} {1,2} {1,3} → c1=3 c2=2 c3=1... c3 below support
    val b = Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L),
      (12L, 1L), (12L, 3L)).toDF("ok", "pk")
    val got = MarketBasket.itemNeighbors(b, "ok", "pk", k = 5, minSupport = 2)
      .orderBy("item", "rank")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    val cos12 = BigDecimal(2.0 / (math.sqrt(3.0) * math.sqrt(2.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, 2L, cos12, 1L), (2L, 1L, 2L, cos12, 1L)))
  }

  // ---------- priority sampling ----------

  test("prioritySample: deterministic, size-k, partitioning-invariant") {
    val docs = (1 to 500).map(i => (i.toLong, (i % 37) + 1L))
      .toDF("doc_id", "w")
    val a = Sampling.prioritySample(docs, "doc_id", "w", k = 50, seed = 17)
      .select("doc_id").as[Long].collect().toSeq
    val b = Sampling.prioritySample(docs.repartition(7), "doc_id", "w",
      k = 50, seed = 17).select("doc_id").as[Long].collect().toSeq
    assert(a.length == 50 && a == b)
  }

  test("prioritySample: heavier weights are sampled more often") {
    // half the corpus has 20x the weight; it should dominate the sample
    val docs = (1 to 400).map(i =>
      (i.toLong, if (i <= 200) 200L else 10L)).toDF("doc_id", "w")
    val heavy = Sampling.prioritySample(docs, "doc_id", "w", k = 100, seed = 5)
      .where(col("doc_id") <= 200).count()
    assert(heavy > 75, s"expected heavy-weight dominance, got $heavy/100")
  }

  // ---------- clustering coefficient ----------

  test("clusteringCoefficient: triangle closes to 1.0, path scores 0") {
    import graft.graph.PropertyGraph
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    // triangle 1-2-3 plus pendant 3-4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val got = PropertyGraph(verts, edges).clusteringCoefficient
      .orderBy("id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      // vertex 3: deg 3, 1 triangle of C(3,2)=3 wedges → 1/3
      (3L, 3L, 1L, 1.0 / 3.0), (4L, 1L, 0L, 0.0)))
  }

  test("clusteringCoefficient: multi-edges and direction do not inflate") {
    import graft.graph.PropertyGraph
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val dup = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = PropertyGraph(verts, dup).clusteringCoefficient
      .orderBy("id").select("coeff").as[Double].collect()
    assert(got.toSeq == Seq(1.0, 1.0, 1.0))
  }

  // ---------- assortativity ----------

  test("assortativity: star is maximally disassortative, clique degenerate") {
    import graft.graph.PropertyGraph
    val sverts = (1L to 5L).toDF("id")
    val star = (2L to 5L).map(i => (1L, i)).toDF("src", "dst")
    val r = PropertyGraph(sverts, star).assortativity
      .select("assortativity").as[Double].collect().head
    // star: every edge connects deg-4 hub to deg-1 leaf → r = -1
    assert(r == -1.0)
    // clique: all degrees equal → zero variance → NULL (0/0 division)
    val kverts = (1L to 4L).toDF("id")
    val clique = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("src", "dst")
    val kr = PropertyGraph(kverts, clique).assortativity
      .select(col("assortativity")).collect().head
    assert(kr.isNullAt(0))
  }

  // ---------- random walks ----------

  test("randomWalks: deterministic, partitioning-invariant, edge-respecting") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = RandomWalks.walks(edges, steps = 3, seed = 17L)
      .orderBy("start").collect().toSeq
    val b = RandomWalks.walks(edges.repartition(7), steps = 3, seed = 17L)
      .orderBy("start").collect().toSeq
    assert(a == b && a.nonEmpty)
    // every hop is a real undirected edge
    val adj = edges.as[(Long, Long)].collect()
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }.toSet
    a.foreach { r =>
      val hops = Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      hops.sliding(2).foreach { case Seq(u, v) =>
        assert(adj((u, v)), s"walk used non-edge ($u,$v)")
      }
    }
  }

  test("randomWalks: different seeds give different corpora") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(9)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = RandomWalks.walks(edges, 3, 1L).orderBy("start").collect().toSeq
    val b = RandomWalks.walks(edges, 3, 2L).orderBy("start").collect().toSeq
    assert(a != b)
  }

  // ---------- transition matrix ----------

  test("transitionMatrix: counts consecutive pairs per user, rows normalize") {
    val ev = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(1), 2L), (1L, "a", ts(2), 3L),
      (1L, "b", ts(3), 4L),
      (2L, "a", ts(0), 5L), (2L, "a", ts(1), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries.transitionMatrix(ev)
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect().toSeq
    // u1: a→b, b→a, a→b; u2: a→a  ⇒ a→{a:1, b:2}, b→{a:1}
    assert(got == Seq(
      ("a", "a", 1L, 1.0 / 3.0), ("a", "b", 2L, 2.0 / 3.0),
      ("b", "a", 1L, 1.0)))
  }

  test("transitionMatrix: no cross-user transitions") {
    val ev = Seq((1L, "a", ts(0), 1L), (2L, "b", ts(1), 2L))
      .toDF("user_id", "event_type", "ts", "event_id")
    assert(TimeSeries.transitionMatrix(ev).count() == 0)
  }

  // ---------- tf-idf cosine ----------

  test("tfidf cosinePairs: exact clones score 1.0, disjoint docs absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "epsilon zeta eta theta")).toDF("doc_id", "text")
    val got = TfIdf.cosinePairs(docs, minCosine = 0.5, dfCapRatio = 0.9)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._4)) == Seq((1L, 2L, 1.0)))
  }

  test("tfidf cosinePairs: df cap drops corpus-wide terms from scoring") {
    // 'common' appears everywhere; with the cap, docs 1/2 share nothing
    val docs = Seq(
      (1L, "common unique1"), (2L, "common unique2"),
      (3L, "common unique3"), (4L, "common unique4")).toDF("doc_id", "text")
    assert(TfIdf.cosinePairs(docs, minCosine = 0.01, dfCapRatio = 0.5)
      .count() == 0)
  }

  test("tfidf dfCapMax: absolute cut bounds candidates independent of N") {
    // 'pair' sits at df=2 of N=6 (under the 0.5 ratio) — the absolute cap
    // at 1 still removes it, killing the only candidate pair
    val docs = (1L to 4L).map(i => (i, s"only$i words")) ++
      Seq((5L, "pair common"), (6L, "pair common"))
    val df = docs.toDF("doc_id", "text")
    assert(TfIdf.cosinePairs(df, minCosine = 0.01, dfCapRatio = 0.5).count() == 1)
    assert(TfIdf.cosinePairs(df, minCosine = 0.01, dfCapRatio = 0.5,
      dfCapMax = 1L).count() == 0)
  }

  test("tfidf weights: rarer terms weigh more at equal tf") {
    val docs = Seq(
      (1L, "rare shared"), (2L, "shared x"), (3L, "shared y"),
      (4L, "z w")).toDF("doc_id", "text")
    val w = TfIdf.weights(docs, dfCapRatio = 0.9)
      .where(col("doc_id") === 1).orderBy("term")
      .select("term", "w").as[(String, Long)].collect().toMap
    assert(w("rare") > w("shared"))
  }

  // ---------- SCD-2 change intervals ----------

  test("changeIntervals: runs collapse, valid_to chains, open tail current") {
    val ev = Seq(
      (1L, "a", ts(0), 1L), (1L, "a", ts(10), 2L), (1L, "b", ts(20), 3L),
      (1L, "a", ts(30), 4L),
      (2L, "x", ts(5), 5L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries.changeIntervals(ev)
      .orderBy("user_id", "run_id")
      .select("user_id", "run_id", "event_type", "n_events",
        "valid_from_ms", "valid_to_ms", "is_current")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getInt(6)))
    def ms(minute: Int): Long = ts(minute).getTime
    assert(got == Seq(
      (1L, 1L, "a", 2L, ms(0), ms(20), 0),
      (1L, 2L, "b", 1L, ms(20), ms(30), 0),
      (1L, 3L, "a", 1L, ms(30), -1L, 1),
      (2L, 1L, "x", 1L, ms(5), -1L, 1)))
  }

  test("changeIntervals: partitioning-invariant, ordered by event time") {
    val rnd = new scala.util.Random(11)
    val ev = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong, s"t${rnd.nextInt(3)}", ts(i), i.toLong)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val a = TimeSeries.changeIntervals(ev)
      .orderBy("user_id", "run_id").collect().toSeq
    val b = TimeSeries.changeIntervals(ev.repartition(13))
      .orderBy("user_id", "run_id").collect().toSeq
    assert(a == b && a.nonEmpty)
    // exactly one open (current) interval per user
    val open = a.groupBy(_.getLong(0))
      .map { case (_, rs) => rs.count(_.getInt(7) == 1) }
    assert(open.forall(_ == 1))
  }

  // ---------- top paths ----------

  test("topPaths: time-ordered paths, exact counts, deterministic top-k") {
    val ev = Seq(
      (1L, "a", ts(0), 1L), (1L, "b", ts(10), 2L),
      (2L, "a", ts(5), 3L), (2L, "b", ts(15), 4L),
      (3L, "b", ts(0), 5L), (3L, "a", ts(10), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val got = TimeSeries.topPaths(ev, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a>b", 2L), ("b>a", 1L)))
  }

  test("topPaths: partitioning-invariant despite collect_list") {
    val rnd = new scala.util.Random(107)
    val ev = (1 to 600).map { i =>
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(4)}", ts(i), i.toLong)
    }.toDF("user_id", "event_type", "ts", "event_id")
    val a = TimeSeries.topPaths(ev, 15).collect().toSeq
    val b = TimeSeries.topPaths(ev.repartition(13), 15).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  // ---------- sliding-window distinct actives ----------

  test("slidingDistinct: hand-checked DAU/WAU, window covers trailing days") {
    def dts(day: Int, h: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-${day + 1}%02d $h%02d:00:00")
    // day0: users 1,2; day1: user 1 (twice); day3: users 2,3
    val ev = Seq(
      (1L, dts(0, 1)), (2L, dts(0, 5)), (1L, dts(1, 2)), (1L, dts(1, 9)),
      (2L, dts(3, 0)), (3L, dts(3, 8))
    ).toDF("user_id", "ts")
    val got = TimeSeries.slidingDistinct(ev, windowDays = 3)
      .orderBy("day").as[(Long, Long, Long)].collect().toSeq
    val base = got.head._1
    val byDay = got.map(r => (r._1 - base) -> ((r._2, r._3))).toMap
    assert(byDay(0L) == ((2L, 2L))) // {1,2} / {1,2}
    assert(byDay(1L) == ((1L, 2L))) // {1} / {1,2}
    assert(byDay(3L) == ((2L, 3L))) // {2,3} / day1..3 = {1,2,3}
    assert(!byDay.contains(2L)) // no events on day2 -> not an observed day
  }

  test("slidingDistinct: partitioning-invariant, 1-day window == daily") {
    val rnd = new scala.util.Random(29)
    val ev = (1 to 1200).map { i =>
      (rnd.nextInt(60).toLong,
        Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(20)}%02d 03:00:00"))
    }.toDF("user_id", "ts")
    val a = TimeSeries.slidingDistinct(ev, 7).orderBy("day")
      .collect().toSeq
    val b = TimeSeries.slidingDistinct(ev.repartition(17), 7).orderBy("day")
      .collect().toSeq
    assert(a == b && a.nonEmpty)
    val one = TimeSeries.slidingDistinct(ev, 1).orderBy("day")
      .as[(Long, Long, Long)].collect().toSeq
    assert(one.forall(r => r._2 == r._3))
  }

  test("slidingDistinctApprox: estimates track exact counts within rsd bound") {
    val rnd = new scala.util.Random(31)
    val ev = (1 to 3000).map { i =>
      (rnd.nextInt(400).toLong,
        Timestamp.valueOf(f"2024-01-${1 + rnd.nextInt(15)}%02d 04:00:00"))
    }.toDF("user_id", "ts")
    val exact = TimeSeries.slidingDistinct(ev, 7)
    val approx = TimeSeries.slidingDistinctApprox(ev, 7)
    val joined = exact.join(approx, Seq("day"))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(joined.nonEmpty && joined.size == exact.count())
    joined.foreach { case (day, e1, e7, a1, a7) =>
      assert(math.abs(a1 - e1) <= 0.065 * e1 + 1,
        s"day=$day 1d exact=$e1 approx=$a1")
      assert(math.abs(a7 - e7) <= 0.065 * e7 + 1,
        s"day=$day 7d exact=$e7 approx=$a7")
    }
    // merge associativity sanity: a 1-day window's estimate is the plain
    // per-day sketch estimate (union of one sketch is the identity)
    val one = TimeSeries.slidingDistinctApprox(ev, 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(one.forall(r => r._2 == r._3))
  }

  // ---------- PPMI ----------

  test("ppmi: hand-checked weights, non-positive PMI rows dropped") {
    import graft.graph.RandomWalks
    val pairs = Seq(
      (1L, 2L, 8L), (2L, 1L, 8L), (1L, 3L, 2L), (3L, 1L, 2L),
      (2L, 3L, 1L), (3L, 2L, 1L)
    ).toDF("center", "context", "cnt")
    val got = RandomWalks.ppmi(pairs).orderBy("center", "context")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // N=22; marginals 1→10, 2→9, 3→3 on both sides.
    val p12 = math.rint(math.log(8.0 * 22 / (10 * 9)) * 1e6) / 1e6
    val p13 = math.rint(math.log(2.0 * 22 / (10 * 3)) * 1e6) / 1e6
    // (2,3): ln(22/27) < 0 → clipped to 0 → dropped
    assert(got == Seq(
      (1L, 2L, 8L, p12), (1L, 3L, 2L, p13),
      (2L, 1L, 8L, p12), (3L, 1L, 2L, p13)))
  }

  test("ppmi composes over skipGramPairs, partitioning-invariant") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val p1 = RandomWalks.ppmi(
        RandomWalks.skipGramPairs(edges, 3, 17L, 2))
      .orderBy("center", "context").collect().toSeq
    val p2 = RandomWalks.ppmi(
        RandomWalks.skipGramPairs(edges.repartition(9), 3, 17L, 2))
      .orderBy("center", "context").collect().toSeq
    assert(p1 == p2 && p1.nonEmpty)
    assert(p1.forall(_.getDouble(3) > 0))
  }

  // ---------- node2vec walks ----------

  test("node2vecWalks: unit factors reduce to the unbiased walk") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(21)
    val edges = Seq.fill(250)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val unbiased = RandomWalks.walks(edges, 3, 17L)
      .orderBy("start").collect().toSeq
    val unit = RandomWalks.node2vecWalks(edges, 3, 17L, 1, 1)
      .orderBy("start").collect().toSeq
    assert(unit == unbiased && unit.nonEmpty)
  }

  test("node2vecWalks: high return factor suppresses backtracking") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    def backtracks(rf: Int): Long = RandomWalks
      .node2vecWalks(edges, 3, 17L, rf, 1)
      .where(col("v2") === col("start")).count()
    assert(backtracks(16) < backtracks(1),
      s"rf=16 gave ${backtracks(16)} backtracks vs rf=1 ${backtracks(1)}")
  }

  test("node2vecWalks: deterministic, partitioning-invariant, edge-respecting") {
    import graft.graph.RandomWalks
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = RandomWalks.node2vecWalks(edges, 3, 17L, 4, 2)
      .orderBy("start").collect().toSeq
    val b = RandomWalks.node2vecWalks(edges.repartition(7), 3, 17L, 4, 2)
      .orderBy("start").collect().toSeq
    assert(a == b && a.nonEmpty)
    val adj = edges.as[(Long, Long)].collect()
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }.toSet
    a.foreach { r =>
      val hops = Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      hops.sliding(2).foreach { case Seq(u, v) =>
        assert(adj((u, v)), s"walk used non-edge ($u,$v)")
      }
    }
  }

  // ---------- bigram LM ----------

  test("bigramScore: hand-computed Laplace bigram model") {
    val docs = Seq((1L, "a b a"), (2L, "a b")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    // bigrams: d1 = {"a b","b a"}, d2 = {"a b"}; c2("a b")=2, c2("b a")=1
    // contexts: c1(a)=2, c1(b)=1; vocabulary V=2
    val d1lp = (math.log(3.0 / 4) + math.log(2.0 / 3)) / 2
    val d2lp = math.log(3.0 / 4)
    assert(got == Seq(
      (1L, 2L, 3L, 1.5, d1lp),
      (2L, 1L, 2L, 2.0, d2lp)))
  }

  test("bigramScore: single-token docs have no bigrams and are absent") {
    val docs = Seq((1L, "only"), (2L, "two words")).toDF("doc_id", "text")
    val ids = TextAnalysis.bigramScore(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(2L))
  }

  // ---------- quantile bins ----------

  test("quantileBins: exact NTILE semantics at every n mod k") {
    // compare the distributed-rank formulation against Spark's own ntile
    // (single-partition window — fine at test size) for several n, k
    for (n <- Seq(5, 16, 17, 23); k <- Seq(1, 3, 4, 8)) {
      val df = (1 to n).map(i => ((i * 37 % n).toDouble, i.toLong))
        .toDF("value", "id")
      val got = FeatureEncoding.quantileBins(df, "value", "id", k)
        .select("id", "bin").as[(Long, Int)].collect().toMap
      val exp = df.select(col("id"),
          ntile(k).over(org.apache.spark.sql.expressions.Window
            .orderBy("value", "id")).as("bin"))
        .as[(Long, Int)].collect().toMap
      assert(got == exp, s"n=$n k=$k")
    }
  }

  test("quantileBins: partitioning-invariant, bucket sizes differ by <= 1") {
    val rnd = new scala.util.Random(3)
    val df = (1 to 1000).map(i => (rnd.nextDouble() * 100, i.toLong))
      .toDF("value", "id")
    val a = FeatureEncoding.quantileBins(df, "value", "id", 7)
      .orderBy("id").collect().toSeq
    val b = FeatureEncoding.quantileBins(df.repartition(17), "value", "id", 7)
      .orderBy("id").collect().toSeq
    assert(a == b)
    val sizes = a.groupBy(_.getInt(2)).view.mapValues(_.size).values.toSeq
    assert(sizes.max - sizes.min <= 1 && sizes.size == 7)
  }
}
