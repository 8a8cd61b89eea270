package graft.graph

import graft.SparkTestBase

class MatchingSpec extends SparkTestBase {
  import spark.implicits._

  test("maximalMatching: path of two edges matches exactly one") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val got = Matching.maximalMatching(edges, rounds = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got.size == 1)
    assert(Seq((1L, 2L), (2L, 3L)).contains(got.head))
  }

  test("maximalMatching: result is a matching (no endpoint reused)") {
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(500)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val m = Matching.maximalMatching(edges, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    val ends = m.flatMap { case (a, b) => Seq(a, b) }
    assert(ends.distinct.size == ends.size, "an endpoint was matched twice")
    assert(m.nonEmpty)
  }

  test("maximalMatching: maximal after enough rounds") {
    val rnd = new scala.util.Random(47)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val m = Matching.maximalMatching(edges, rounds = 8)
      .as[(Long, Long)].collect().toSet
    val matchedV = m.flatMap { case (a, b) => Seq(a, b) }
    val und = edges.as[(Long, Long)].collect()
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    // maximality: every edge touches a matched vertex
    und.foreach { case (a, b) =>
      assert(matchedV(a) || matchedV(b), s"edge ($a,$b) extendable")
    }
  }

  test("maximalMatching: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(53)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Matching.maximalMatching(edges, 3).orderBy("a", "b").collect().toSeq
    val b = Matching.maximalMatching(edges.repartition(9), 3)
      .orderBy("a", "b").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
