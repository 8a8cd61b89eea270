package graft.graph

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  /** Driver-side reference peeling over a small adjacency list. */
  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var changed = true
    while (changed) {
      val deg = und.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = und.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.size != und.size
      und = next
    }
    und.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  private def graph(edges: Seq[(Long, Long)]): PropertyGraph = {
    val ids = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
    PropertyGraph(ids.toDF("id"), edges.toDF("src", "dst"))
  }

  // a 4-clique (core number 3) with a pendant path hanging off it, plus a
  // separate triangle (core number 2)
  private val edges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // clique
    (4L, 5L), (5L, 6L), // path
    (7L, 8L), (8L, 9L), (7L, 9L)) // triangle

  test("fixpoint k-core matches brute-force peeling for k = 1..4") {
    for (k <- 1 to 4) {
      val got = KCore.run(graph(edges), k).as[(Long, Long)].collect()
        .map { case (id, d) => id -> d.toInt }.toMap
      assert(got == bruteKCore(edges, k), s"k=$k")
    }
  }

  test("3-core keeps exactly the clique") {
    val got = KCore.run(graph(edges), 3).as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got.values.forall(_ == 3L))
  }

  test("fixed-round peeling converges to the fixpoint once rounds suffice") {
    // the pendant path needs 2 rounds to fully peel at k=2
    val fix = KCore.run(graph(edges), 2).as[(Long, Long)].collect().toSet
    val r2 = KCore.pruneRounds(graph(edges), 2, 2).as[(Long, Long)].collect().toSet
    val r5 = KCore.pruneRounds(graph(edges), 2, 5).as[(Long, Long)].collect().toSet
    assert(r2 == fix && r5 == fix)
    // one round is NOT enough: vertex 5 survives round 1 (degree 2 via 4,6)
    val r1 = KCore.pruneRounds(graph(edges), 2, 1).as[(Long, Long)].collect().toSet
    assert(r1.map(_._1).contains(5L))
  }

  test("duplicate and reversed edges collapse to simple-graph semantics") {
    val noisy = edges ++ Seq((2L, 1L), (1L, 2L), (3L, 1L))
    val got = KCore.run(graph(noisy), 3).as[(Long, Long)].collect().toMap
    assert(got == bruteKCore(edges, 3))
  }

  test("strict mode throws on non-convergence within maxIter") {
    intercept[IllegalStateException] {
      KCore.run(graph(edges), 2, maxIter = 1, strict = true).collect()
    }
  }
}

class SccJumpSpec extends SparkTestBase {
  import spark.implicits._

  // Both phases (forward coloring AND backward collect) run under
  // strict maxIter = 25, so each orientation proves O(log n) + warmup
  // rounds end-to-end: a 150-cycle needs ~150 one-hop rounds without
  // jumping, and a raw-id-ordered min-witness jump would stall on
  // whichever direction has ids monotone *increasing* along the
  // propagation (the witness is a self-pointer there) — ascending ids hit
  // that stall in the backward phase, descending ids in the forward
  // phase. minPropagate orders by xxhash64(id) precisely so neither
  // orientation is monotone in the order; both tests pin that the single
  // hash-ordered witness keeps the doubling going either way.
  private def cycleScc(edge: Int => (Long, Long)): Unit = {
    val n = 150
    val edges = (0 until n).map(edge)
    val verts = (0 until n).map(_.toLong).toDF("id")
    val out = StronglyConnectedComponents
      .run(PropertyGraph(verts, edges.toDF("src", "dst")), maxIter = 25, strict = true)
      .as[(Long, Long)].collect()
    assert(out.length == n && out.forall(_._2 == 0L))
  }

  test("pointer jumping converges a long ascending-id cycle within O(log n) + warmup rounds") {
    cycleScc(i => (i.toLong, ((i + 1) % 150).toLong))
  }

  test("pointer jumping converges a long descending-id cycle within O(log n) + warmup rounds") {
    cycleScc(i => (((i + 1) % 150).toLong, i.toLong))
  }
}
