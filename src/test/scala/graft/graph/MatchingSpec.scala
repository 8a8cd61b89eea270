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

  test("maximalIndependentSet: independence holds at every round count") {
    val rnd = new scala.util.Random(91)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val und = edges.as[(Long, Long)].collect()
      .map { case (x, y) => (math.min(x, y), math.max(x, y)) }.toSet
    for (r <- Seq(1, 2, 6)) {
      val mis = Matching.maximalIndependentSet(edges, r)
        .as[Long].collect().toSet
      und.foreach { case (a, b) =>
        assert(!(mis(a) && mis(b)), s"adjacent pair ($a,$b) both in MIS, r=$r")
      }
    }
  }

  test("maximalIndependentSet: maximal after enough rounds") {
    val rnd = new scala.util.Random(97)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val mis = Matching.maximalIndependentSet(edges, 8).as[Long].collect().toSet
    val adj = edges.as[(Long, Long)].collect()
      .flatMap { case (x, y) => Seq((x, y), (y, x)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val verts = adj.keySet
    // every non-MIS vertex has an MIS neighbor (else it could be added)
    (verts -- mis).foreach { v =>
      assert(adj(v).exists(mis), s"vertex $v addable to the MIS")
    }
  }

  test("maximalIndependentSet: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(101)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Matching.maximalIndependentSet(edges, 3).orderBy("v").collect().toSeq
    val b = Matching.maximalIndependentSet(edges.repartition(7), 3)
      .orderBy("v").collect().toSeq
    assert(a == b && a.nonEmpty)
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
