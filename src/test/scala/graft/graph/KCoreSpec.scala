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

class SccStrategyParitySpec extends SparkTestBase {
  import spark.implicits._

  // Mixed topology: two cycles (one reachable from the other one-way, so
  // they stay distinct SCCs), a DAG tail feeding a cycle, a dangling
  // chain, a self-loop, and an isolated vertex.
  private val verts = ((0L to 5L) ++ (10L to 14L) ++ Seq(20L, 21L, 22L, 25L, 30L)).toDF("id")
  private val edges = Seq(
    0L -> 1L, 1L -> 2L, 2L -> 0L,                       // 3-cycle {0,1,2}
    10L -> 11L, 11L -> 12L, 12L -> 13L, 13L -> 14L, 14L -> 10L, // 5-ring
    2L -> 10L,                                          // one-way bridge
    20L -> 21L, 21L -> 22L, 22L -> 0L,                  // DAG tail into the cycle
    3L -> 4L, 4L -> 5L,                                 // dangling chain
    25L -> 25L                                          // self-loop
  ).toDF("src", "dst")

  private def sccWith(confs: Map[String, String]): Map[Long, Long] = {
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try StronglyConnectedComponents
      .run(PropertyGraph(verts, edges), strict = true)
      .as[(Long, Long)].collect().toMap
    finally confs.keys.foreach(spark.conf.unset)
  }

  test("collect strategies, partition collapse, and trim gate all agree") {
    val base = sccWith(Map.empty)
    // known structure: the two cycles are distinct SCCs, everything else
    // singleton
    assert(Seq(0L, 1L, 2L).forall(base(_) == 0L))
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(base(_) == 10L))
    assert(Seq(3L, 4L, 5L, 20L, 21L, 22L, 25L, 30L).forall(v => base(v) == v))
    // every at-scale code path must produce the identical assignment:
    // endpoints collect (what auto picks past the broadcast gate), full
    // collect, no partition collapse, trim disabled, shuffle-join path
    // (broadcastThreshold=0 - the 100 TB plan shape), and combinations
    val arms = Seq(
      Map("spark.graft.scc.collect" -> "endpoints"),
      Map("spark.graft.scc.collect" -> "full"),
      Map("spark.graft.scc.smallPartitions" -> "0"),
      Map("spark.graft.scc.trimMinPeelFrac" -> "1.0"),
      Map("spark.graft.scc.broadcastThreshold" -> "0"),
      Map("spark.graft.scc.collect" -> "endpoints",
        "spark.graft.scc.broadcastThreshold" -> "0",
        "spark.graft.scc.smallPartitions" -> "0"),
      Map("spark.graft.scc.jumpHops" -> "4"),
      // dense-graph path: edge frames keep full parallelism even when the
      // vertex sets are under the broadcast gate
      Map("spark.graft.scc.edgeCollapseThreshold" -> "0"))
    arms.foreach { confs =>
      assert(sccWith(confs) == base, s"assignment diverged under $confs")
    }
  }
}
