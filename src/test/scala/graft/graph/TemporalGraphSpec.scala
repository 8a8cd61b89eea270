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
}
