package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CentralitySpec extends SparkTestBase {
  import spark.implicits._

  test("harmonic/closeness on a path graph, landmark self-distance excluded") {
    val g = PropertyGraph(
      (1L to 4L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst"))
    val got = Centrality.harmonic(g, Seq(1L, 4L))
      .select("id", "n_reached", "harmonic", "closeness")
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((1L, 1.0 / 3, 1.0 / 3))) // only d(1,4)=3 counts
    assert(got(2L) == ((2L, 1.5, 2.0 / 3)))     // d=1, d=2
    assert(got(3L) == ((2L, 1.5, 2.0 / 3)))
    assert(got(4L) == ((1L, 1.0 / 3, 1.0 / 3)))
  }

  test("disconnected vertices never appear; estimator is partitioning-invariant") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    def run(parts: Int) = Centrality.harmonic(
      PropertyGraph(Seq(1L, 2L, 3L, 10L, 11L).toDF("id"), edges.repartition(parts)),
      Seq(1L))
      .select("id", "n_reached", "harmonic")
      .as[(Long, Long, Double)].collect().toSet
    val base = run(1)
    // 10/11 are unreachable from landmark 1; landmark 1 itself has dist 0 only
    assert(base.map(_._1) == Set(2L, 3L))
    assert(run(4) == base)
  }
}
