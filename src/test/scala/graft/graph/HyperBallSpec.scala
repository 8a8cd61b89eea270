package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class HyperBallSpec extends SparkTestBase {
  import spark.implicits._

  private def graph(edges: Seq[(Long, Long)], n: Long) =
    PropertyGraph((1L to n).toDF("id"), edges.toDF("src", "dst"))

  test("hll primitives: init/merge/count estimate distinct ids within rsd") {
    // p=11 -> rsd ~2.3%; 5000 distinct ids must estimate within ~3 sigma
    val est = spark.range(5000)
      .select(call_function("hll_init", col("id"), lit(11)).as("s"))
      .agg(call_function("hll_count", call_function("hll_merge", col("s"))))
      .as[Double].collect().head
    assert(math.abs(est - 5000.0) < 5000 * 0.07, s"estimate $est")
  }

  test("ball sizes on a directed path converge to suffix sizes") {
    // 1->2->3->4->5: out-ball of vertex i = {i..5}; p=8 on 5 ids is in the
    // linear-counting regime, where tiny-set estimates are near-exact
    val res = HyperBall.run(graph(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), 5), p = 8)
      .select("id", "ball_size", "rounds")
      .as[(Long, Double, Long)].collect()
    res.foreach { case (id, ball, _) =>
      val exact = 5 - id + 1
      assert(math.abs(ball - exact) < 0.6, s"vertex $id ball $ball vs $exact")
    }
    // diameter 4 -> fixpoint detected by round 5 at the latest
    assert(res.head._3 <= 6)
  }

  test("star center has the highest harmonic centrality") {
    val spokes = (2L to 9L).flatMap(i => Seq((1L, i), (i, 1L)))
    val res = HyperBall.run(graph(spokes, 9), p = 8)
      .select("id", "harmonic").as[(Long, Double)].collect().toMap
    val center = res(1L)
    (2L to 9L).foreach(i => assert(center > res(i),
      s"center harmonic $center should beat spoke ${res(i)}"))
  }

  test("estimates are exactly partitioning-independent (idempotent max-merge)") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(300)((rnd.nextInt(60) + 1L, rnd.nextInt(60) + 1L))
      .filter(e => e._1 != e._2)
    def run(parts: Int) = HyperBall.run(
      PropertyGraph((1L to 60L).toDF("id"), edges.toDF("src", "dst").repartition(parts)),
      p = 6)
      .select("id", "ball_size", "harmonic")
      .as[(Long, Double, Double)].collect().toSet
    assert(run(1) == run(7))
  }

  test("isolated vertices survive with harmonic 0") {
    val iso = HyperBall.run(graph(Seq((1L, 2L)), 4), p = 8)
      .filter(col("id") > 2).select("id", "harmonic")
      .as[(Long, Double)].collect().toMap
    assert(iso.keySet == Set(3L, 4L))
    assert(iso.values.forall(_ == 0.0))
  }
}
