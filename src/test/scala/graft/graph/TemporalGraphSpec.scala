package graft.graph

import graft.SparkTestBase

class TemporalGraphSpec extends SparkTestBase {
  import spark.implicits._

  test("earliestArrival: time-ordering gates the chain") {
    // 1 -(t=5)-> 2 -(t=3)-> 3: static path exists, temporal does not;
    // adding 2 -(t=7)-> 4 reaches with arrival 7
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 3L), (2L, 4L, 7L))
      .toDF("src", "dst", "t")
    val got = TemporalGraph.earliestArrival(edges, Seq(1L), rounds = 4)
      .as[(Long, Long, Long)].collect()
      .map(r => r._2 -> r._3).toMap
    assert(got(1L) == Long.MinValue)
    assert(got(2L) == 5L)
    assert(got(4L) == 7L)
    assert(!got.contains(3L), "chain violated time order but was reached")
  }

  test("earliestArrival: picks the earliest usable arrival, not the first") {
    // two routes to 3: via 2 arriving t=10, direct at t=20 — earliest is 10
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 10L), (1L, 3L, 20L))
      .toDF("src", "dst", "t")
    val got = TemporalGraph.earliestArrival(edges, Seq(1L), rounds = 4)
      .as[(Long, Long, Long)].collect().map(r => r._2 -> r._3).toMap
    assert(got(3L) == 10L)
  }

  test("earliestArrival: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(103)
    val edges = Seq.fill(500)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong,
        rnd.nextInt(100).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst", "t")
    val a = TemporalGraph.earliestArrival(edges, Seq(0L, 1L), 4)
      .orderBy("source", "v").collect().toSeq
    val b = TemporalGraph.earliestArrival(edges.repartition(9), Seq(0L, 1L), 4)
      .orderBy("source", "v").collect().toSeq
    assert(a == b && a.nonEmpty)
    // temporal reach is a subset of static reach
    val temporal = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val adj = edges.as[(Long, Long, Long)].collect()
      .map { case (s, d, _) => (s, d) }
    val staticReach = {
      var reach = Set(0L -> 0L, 1L -> 1L)
      var grew = true
      while (grew) {
        val next = reach ++ adj.flatMap { case (s, d) =>
          reach.filter(_._2 == s).map(r => (r._1, d))
        }
        grew = next.size > reach.size; reach = next
      }
      reach
    }
    assert(temporal.subsetOf(staticReach))
  }

  test("layeringChains: time, window, decay, and simple-path gates") {
    // 1→2→3→4 valid (amounts 1000→800→640, days 0→10→20)
    val base = Seq(
      (1L, 2L, 0L, 1000L), (2L, 3L, 10L, 800L), (3L, 4L, 20L, 640L))
    def chains(extra: (Long, Long, Long, Long)*) =
      graft.graph.TemporalGraph.layeringChains(
        (base ++ extra).toDF("src", "dst", "t", "amt"),
        hops = 3, windowT = 30L, decayPermille = 700)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
    assert(chains() == Set((1L, 4L, 0L, 20L, 1000L, 640L)))
    // an alternative last hop breaking each gate adds no chain:
    assert(chains((3L, 5L, 60L, 640L)) == chains())   // outside window
    assert(chains((3L, 5L, 20L, 900L)) == chains())   // amount grows
    assert(chains((3L, 5L, 20L, 100L)) == chains())   // decayed below 70%
    assert(chains((3L, 1L, 20L, 640L)) == chains())   // revisits v0
    // a valid alternative adds exactly one more chain
    assert(chains((3L, 5L, 25L, 700L)) ==
      chains() + ((1L, 5L, 0L, 25L, 1000L, 700L)))
  }

  test("layeringChains: partitioning-invariant") {
    val rnd = new scala.util.Random(61)
    val es = (1 to 400).map { i =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong,
        rnd.nextInt(50).toLong, (rnd.nextInt(900) + 100).toLong)
    }
    def run(parts: Int) =
      graft.graph.TemporalGraph.layeringChains(
        es.toDF("src", "dst", "t", "amt").repartition(parts),
        hops = 3, windowT = 10L, decayPermille = 600)
        .as[(Long, Long, Long, Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.length).toMap
    assert(run(1) == run(11) && run(1).nonEmpty)
  }
}
