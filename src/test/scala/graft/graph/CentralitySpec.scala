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

  test("hits: out-star center is the hub, leaves are the authorities") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Centrality.hits(edges, rounds = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // center: hub 10000, authority 0; leaves: hub 0, authority 10000
    assert(got(1L) == ((10000L, 0L)))
    Seq(2L, 3L, 4L).foreach(v => assert(got(v) == ((0L, 10000L))))
  }

  test("hits: authority follows in-degree mass, hand-checked") {
    // 1->3, 2->3, 1->4: after round 1, ar(3)=2S, ar(4)=S -> a(3)=10000,
    // a(4)=5000; hr(1)=15000, hr(2)=10000 -> h(1)=10000, h(2)=6666
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L)).toDF("src", "dst")
    val got = Centrality.hits(edges, rounds = 1)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(3L)._2 == 10000L && got(4L)._2 == 5000L)
    assert(got(1L)._1 == 10000L && got(2L)._1 == 6666L)
    assert(got(3L)._1 == 0L && got(4L)._1 == 0L)
  }

  test("pageRankInt: hand-checked one round") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val got = Centrality.pageRankInt(edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // S=1e6. contrib: ->2: 1e6 div 2 = 500000; ->3: 500000 + 1e6
    assert(got(1L) == 150000L)
    assert(got(2L) == (15000000L + 85L * 500000L) / 100L)
    assert(got(3L) == (15000000L + 85L * 1500000L) / 100L)
  }

  test("pageRankInt: sources settle at base rank; mass conserved-bounded") {
    val rnd = new scala.util.Random(59)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val pr = Centrality.pageRankInt(edges, 3)
    val a = pr.orderBy("id").collect().toSeq
    val b = Centrality.pageRankInt(edges.repartition(7), 3)
      .orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    val n = a.size
    val total = a.map(_.getLong(1)).sum
    assert(total <= n * 1000000L, "rank mass exceeded the injected mass")
    // no in-edges -> exactly the base 0.15*S after any rounds
    val dsts = edges.as[(Long, Long)].collect().map(_._2).toSet
    a.filter(r => !dsts(r.getLong(0)))
      .foreach(r => assert(r.getLong(1) == 150000L))
  }

  test("personalizedPageRankInt: hand-checked round, unreachable stays 0") {
    // seed = 1 only; 1->2, 2->3, 4->3 (4 unreachable from the seed)
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("id")
    val got = Centrality.personalizedPageRankInt(edges, seeds, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // p0: 1 -> 1e6, others 0. contrib: ->2: 1e6; ->3: 0 + 0
    assert(got(1L) == 150000L) // seed base, no in-mass
    assert(got(2L) == 85L * 1000000L / 100L)
    assert(got(3L) == 0L)
    assert(got(4L) == 0L) // non-seed source: no base, no in-mass
  }

  test("personalizedPageRankInt: all-seeds == pageRankInt; invariant") {
    val rnd = new scala.util.Random(61)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val allIds = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    val a = Centrality.personalizedPageRankInt(edges, allIds, 3)
      .orderBy("id").collect().toSeq
    val b = Centrality.pageRankInt(edges, 3).orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    val c = Centrality.personalizedPageRankInt(edges.repartition(5),
        allIds, 3).orderBy("id").collect().toSeq
    assert(a == c)
  }

  test("betweennessInt: path graph — the middle vertex carries all flow") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Centrality.betweennessInt(edges, Seq(1L, 3L), maxLevels = 3)
      .as[(Long, Long)].collect().toMap
    // from each landmark: delta(2) = floor(1*(S+0)/1) = S; endpoints 0
    assert(got(2L) == 20000L)
    assert(got(1L) == 0L && got(3L) == 0L)
  }

  test("betweennessInt: star center accumulates (leaves-1) units per landmark") {
    val edges = (2L to 5L).map(l => (1L, l)).toDF("src", "dst")
    val got = Centrality
      .betweennessInt(edges, Seq(2L, 3L, 4L, 5L), maxLevels = 3)
      .as[(Long, Long)].collect().toMap
    // each leaf landmark routes S to the center per other leaf: 4*3*S
    assert(got(1L) == 120000L)
    (2L to 5L).foreach(l => assert(got(l) == 0L))
  }

  test("betweennessInt: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(61)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val lm = Seq(0L, 1L, 2L)
    val a = Centrality.betweennessInt(edges, lm, 4).orderBy("id").collect().toSeq
    val b = Centrality.betweennessInt(edges.repartition(7), lm, 4)
      .orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.forall(_.getLong(1) >= 0))
  }

  test("hits: deterministic and partitioning-invariant on a random digraph") {
    val rnd = new scala.util.Random(37)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Centrality.hits(edges, 3).orderBy("id").collect().toSeq
    val b = Centrality.hits(edges.repartition(11), 3).orderBy("id").collect().toSeq
    assert(a == b && a.nonEmpty)
    // scores live on the integer scale
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 10000 &&
      r.getLong(2) >= 0 && r.getLong(2) <= 10000))
  }
}
