package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class MotifSpec extends SparkTestBase {
  import spark.implicits._

  private def g = PropertyGraph(
    Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("id", "name"),
    Seq((1L, 2L, 10.0), (2L, 3L, 20.0), (3L, 1L, 30.0), (1L, 3L, 40.0))
      .toDF("src", "dst", "amount"))

  test("single-edge motif returns every edge with struct columns") {
    val out = g.find("(a)-[e]->(b)")
    assert(out.columns.toSeq == Seq("a", "e", "b"))
    assert(out.count() == 4)
    val row = out.filter(col("e.amount") === 40.0)
      .select(col("a.name"), col("b.name")).head()
    assert(row.getString(0) == "x" && row.getString(1) == "z")
  }

  test("cycle motif binds repeated vertex names via join predicates") {
    val cycles = g.find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(a)")
    assert(cycles.count() == 3) // the one 3-cycle, in each rotation
    val canonical = cycles.filter(col("a.id") < col("b.id") && col("a.id") < col("c.id"))
    assert(canonical.count() == 1)
  }

  test("struct-star expansion and flatten on motif output") {
    // the reference's selectExpr("graph1.*") shape (SURVEY.md §2.2)
    val out = g.find("(a)-[e]->(b)")
    assert(out.select(col("e.*")).columns.toSeq == Seq("src", "dst", "amount"))
    val flat = Motif.flatten(out, "a", "e", "b")
    assert(flat.columns.toSeq ==
      Seq("a_id", "a_name", "e_src", "e_dst", "e_amount", "b_id", "b_name"))
    assert(flat.count() == 4)
  }

  test("anonymous edges and vertices are supported") {
    assert(g.find("(a)-[]->(b)").columns.toSeq == Seq("a", "b"))
    assert(g.find("(a)-[]->()").count() == 4)
  }

  test("negated term anti-joins (no reverse edge)") {
    val out = g.find("(a)-[e]->(b); !(b)-[]->(a)")
    // 1->3 and 3->1 are mutual; 1->2 and 2->3 have no reverse edge
    assert(out.select(col("e.src"), col("e.dst")).as[(Long, Long)].collect().toSet ==
      Set((1L, 2L), (2L, 3L)))
  }

  test("fan-in motif with shared target") {
    val fanIn = g.find("(a)-[e1]->(m); (b)-[e2]->(m)")
      .filter(col("a.id") < col("b.id"))
    // shared targets: 3 receives from 2 and 1
    assert(fanIn.select(col("m.id")).as[Long].collect().toSeq == Seq(3L))
  }

  test("unparseable pattern is rejected") {
    intercept[IllegalArgumentException](g.find("(a)->[e]-(b)"))
  }

  test("self-loop motif term binds both endpoints to one vertex") {
    val withLoop = PropertyGraph(
      Seq((1L, "x"), (2L, "y")).toDF("id", "name"),
      Seq((1L, 1L, 5.0), (1L, 2L, 6.0)).toDF("src", "dst", "amount"))
    val loops = withLoop.find("(a)-[e]->(a)")
    assert(loops.select(col("a.id")).as[Long].collect().toSeq == Seq(1L))
  }

  test("disconnected pattern components produce the cartesian of matches") {
    val out = g.find("(a)-[e1]->(b); (c)-[e2]->(d)")
    assert(out.count() == 16) // 4 edges x 4 edges, GraphFrames semantics
  }

  test("4-cycle (bushy-compiled) matches the brute-force enumeration") {
    // 6 vertices, a planted 4-cycle 1->2->3->4->1 plus chords and a second
    // cycle 1->3->5->6->1; >=4 edge terms with 2 shared half-vertices takes
    // the bushy two-half plan — results must be identical to brute force
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (1L, 3L), (3L, 5L), (5L, 6L), (6L, 1L), (2L, 5L))
    val gg = PropertyGraph(
      (1L to 6L).map(i => (i, s"v$i")).toDF("id", "name"),
      edges.toDF("src", "dst"))
    val got = gg.find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(d); (d)-[e4]->(a)")
      .select(col("a.id"), col("b.id"), col("c.id"), col("d.id"))
      .as[(Long, Long, Long, Long)].collect().toSet
    val es = edges.toSet
    val brute = (for {
      (a, b) <- edges; (b2, c) <- edges if b2 == b
      (c2, d) <- edges if c2 == c
      if es((d, a))
    } yield (a, b, c, d)).toSet
    assert(got == brute)
    assert(brute.contains((1L, 2L, 3L, 4L)) && brute.contains((1L, 3L, 5L, 6L)))
  }

  test("4-term non-cycle chain stays correct (single shared vertex, left-deep)") {
    val gg = PropertyGraph(
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "name"),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst"))
    val paths = gg.find("(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(d); (d)-[e4]->(f)")
      .select(col("a.id"), col("f.id")).as[(Long, Long)].collect().toSeq
    assert(paths == Seq((1L, 5L)))
  }
}

class ConnectedComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("components with isolated vertex and min-id normalization") {
    val v = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val e = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val got = PropertyGraph(v, e).connectedComponents()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("long chain converges (multiple star rounds)") {
    val n = 64
    val v = (1L to n.toLong).toDF("id")
    val e = (1L until n.toLong).map(i => (i, i + 1)).toDF("src", "dst")
    val got = PropertyGraph(v, e).connectedComponents()
      .select("component").distinct().as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("50k-edge random graph matches driver-side union-find") {
    val rnd = new scala.util.Random(7)
    val n = 20000
    val es = Seq.fill(50000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val got = PropertyGraph((0L until n.toLong).toDF("id"), es.toDF("src", "dst"))
      .connectedComponents()
      .select("id", "component").as[(Long, Long)].collect().toMap
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // canonicalize union-find roots to min member id per component
    val members = (0 until n).groupBy(find)
    val canon = members.flatMap { case (_, ms) => val m = ms.min.toLong; ms.map(_.toLong -> m) }
    assert(got == canon)
  }

  test("string ids work (orderable, not just numeric)") {
    val v = Seq("a", "b", "c", "z").toDF("id")
    val e = Seq(("b", "a"), ("b", "c")).toDF("src", "dst")
    val got = PropertyGraph(v, e).connectedComponents()
      .select("id", "component").as[(String, String)].collect().toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a", "z" -> "z"))
  }

  test("reliable-checkpoint mode matches the localCheckpoint default") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-cc").toString
    // the checkpoint dir is process-global; Checkpointer only sets it when
    // unset, so pin it explicitly (the documented contract for callers that
    // need a specific location) — and restore the prior dir afterwards so
    // later suites don't silently checkpoint under this test's temp dir
    val prevDir = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val rnd = new scala.util.Random(11)
      val es = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt(500).toLong))
        .filter { case (a, b) => a != b }.toDF("src", "dst")
      val local = ConnectedComponents.runOnEdges(es)
        .as[(Long, Long)].collect().toMap
      val reliable = ConnectedComponents.runOnEdges(es, checkpointDir = Some(dir))
        .as[(Long, Long)].collect().toMap
      assert(reliable == local)
      // reliable mode actually wrote checkpoint data
      assert(new java.io.File(dir).listFiles().nonEmpty)
    } finally spark.sparkContext.setCheckpointDir(prevDir.orNull)
  }

  test("spark.graft.checkpointDir conf flips iterative operators to reliable mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-conf").toString
    // pin the process-global context dir so the reliable writes land where
    // this test can observe them (an earlier suite may have set another);
    // restored in the finally so later suites' explicit checkpointDir args
    // don't silently write under this test's temp dir
    val prevDir = spark.sparkContext.getCheckpointDir
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set("spark.graft.checkpointDir", dir)
    try {
      val rnd = new scala.util.Random(13)
      val es = Seq.fill(1000)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
        .filter { case (a, b) => a != b }.toDF("src", "dst")
      // no explicit checkpointDir argument anywhere — the conf alone must
      // switch the run to reliable checkpoint() (files under dir)
      val got = ConnectedComponents.runOnEdges(es).as[(Long, Long)].collect().toMap
      assert(new java.io.File(dir).listFiles().nonEmpty,
        "conf-driven run must write reliable checkpoints")
      spark.conf.unset("spark.graft.checkpointDir")
      val default = ConnectedComponents.runOnEdges(es).as[(Long, Long)].collect().toMap
      assert(got == default, "conf must not change results")
    } finally {
      spark.conf.unset("spark.graft.checkpointDir")
      spark.sparkContext.setCheckpointDir(prevDir.orNull)
    }
  }

  test("scc: cycles merge, bridges and DAG chains stay singletons") {
    val g = PropertyGraph(
      (1L to 7L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 1L),     // SCC {1,2,3}
        (4L, 5L), (5L, 4L),                 // SCC {4,5}
        (3L, 4L), (6L, 1L),                 // bridges: 6 and nothing upstream
        (7L, 7L)                            // self-loop only -> singleton
      ).toDF("src", "dst"))
    val got = g.stronglyConnectedComponents()
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 7L))
  }

  test("scc on a random graph matches driver-side Tarjan") {
    val rnd = new scala.util.Random(13)
    val n = 300
    val es = Seq.fill(700)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val got = PropertyGraph((0L until n.toLong).toDF("id"), es.toDF("src", "dst"))
      .stronglyConnectedComponents()
      .as[(Long, Long)].collect().toMap
    // iterative Tarjan
    val adj = es.groupBy(_._1).view.mapValues(_.map(_._2.toInt)).toMap
    val index = Array.fill(n)(-1); val low = new Array[Int](n)
    val onStack = Array.fill(n)(false)
    val stack = scala.collection.mutable.Stack[Int]()
    val comp = new Array[Int](n); var idx = 0
    def strongconnect(v0: Int): Unit = {
      // explicit work stack: (vertex, next-child-pointer)
      val work = scala.collection.mutable.Stack[(Int, Int)]((v0, 0))
      while (work.nonEmpty) {
        val (v, ci) = work.pop()
        if (ci == 0) {
          index(v) = idx; low(v) = idx; idx += 1; stack.push(v); onStack(v) = true
        }
        val kids = adj.getOrElse(v.toLong, Seq.empty)
        var i = ci; var recursed = false
        while (i < kids.length && !recursed) {
          val w = kids(i)
          if (index(w) == -1) { work.push((v, i + 1)); work.push((w, 0)); recursed = true }
          else { if (onStack(w)) low(v) = math.min(low(v), index(w)); i += 1 }
        }
        if (!recursed) {
          if (low(v) == index(v)) {
            var done = false
            val members = scala.collection.mutable.ArrayBuffer[Int]()
            while (!done) {
              val w = stack.pop(); onStack(w) = false; members += w
              if (w == v) done = true
            }
            val m = members.min
            members.foreach(w => comp(w) = m)
          }
          if (work.nonEmpty) {
            val (p, _) = work.top
            low(p) = math.min(low(p), low(v))
          }
        }
      }
    }
    (0 until n).foreach(v => if (index(v) == -1) strongconnect(v))
    // Tarjan's min tag is not the global min member; normalize via min per component root set
    val byComp = (0 until n).groupBy(comp)
    val expect = byComp.flatMap { case (_, ms) =>
      val m = ms.min.toLong; ms.map(_.toLong -> m)
    }
    assert(got == expect)
  }

  test("label propagation: majority adoption, smallest-label ties, star oscillation") {
    // star 1-{2,3,4,5}: round 1 sends every leaf label 1 and the center the
    // tied set {2,3,4,5} (-> 2); round 2 flips them (classic LPA oscillation
    // under synchronous updates — fixed rounds, like GraphFrames)
    val star = PropertyGraph(
      (1L to 5L).toDF("id"),
      Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("src", "dst"))
    val r1 = star.labelPropagation(1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
    val r2 = star.labelPropagation(2).as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L))
    // triangle converges to the minimum label; isolated vertex keeps its id
    val tri = PropertyGraph(
      Seq(1L, 2L, 3L, 9L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    val t2 = tri.labelPropagation(2).as[(Long, Long)].collect().toMap
    assert(t2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("bfs: directed minimal hops between vertex sets, zero-hop self matches") {
    val g = PropertyGraph(
      (1L to 5L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 4L)).toDF("src", "dst"))
    val got = g.bfs(col("id") === 1, col("id") >= 3, maxHops = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 3L, 2L), (1L, 4L, 2L))) // 1->2->4 beats 1->2->3->4
    // direction respected: nothing reaches upstream
    assert(g.bfs(col("id") === 4, col("id") === 1, 3).count() == 0)
    // an origin matching the target condition reports itself at hop 0
    val self = g.bfs(col("id") === 3, col("id") >= 3, 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(self == Set((3L, 3L, 0L), (3L, 4L, 1L)))
  }

  test("strict mode throws on non-convergence instead of returning a split assignment") {
    val es = (1L until 40L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      ConnectedComponents.runOnEdges(es, maxIter = 0, strict = true).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    // non-strict still returns (possibly split) assignments for tolerant callers
    assert(ConnectedComponents.runOnEdges(es, maxIter = 0).count() == 40L)
  }
}

class PregelSpec extends SparkTestBase {
  import spark.implicits._

  test("sum-combined risk propagation matches hand computation") {
    val v = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("id", "risk")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = PropertyGraph(v, e).pregel
      .withVertexColumn("risk_score", col("risk"),
        coalesce(Pregel.msg + col("risk"), col("risk_score")))
      .sendMsgToDst(Pregel.src("risk_score"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(2)
      .run()
      .select("id", "risk_score").as[(Long, Long)].collect().toMap
    // iter1: v2 = 10+20 = 30, v3 = 20+5 = 25; iter2: v2 = 10+20 = 30, v3 = 30+5 = 35
    assert(out == Map(1L -> 10L, 2L -> 30L, 3L -> 35L))
  }

  test("pregel reliable-checkpoint mode matches the localCheckpoint default") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-pregel").toString
    // pin the process-global dir (Checkpointer sets it only when unset)
    spark.sparkContext.setCheckpointDir(dir)
    val v = Seq((1L, 10L), (2L, 20L), (3L, 5L)).toDF("id", "risk")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    def run(p: Pregel) = p
      .withVertexColumn("risk_score", col("risk"),
        coalesce(Pregel.msg + col("risk"), col("risk_score")))
      .sendMsgToDst(Pregel.src("risk_score"))
      .setMaxIter(2)
      .run()
      .select("id", "risk_score").as[(Long, Long)].collect().toMap
    val local = run(PropertyGraph(v, e).pregel)
    val reliable = run(PropertyGraph(v, e).pregel.setCheckpointDir(dir))
    assert(reliable == local)
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("triangle count ignores direction and counts per member") {
    val g = PropertyGraph(
      Seq(1L, 2L, 3L, 4L, 5L).toDF("id"),
      // triangle 1-2-3 (mixed directions) + pendant 3-4, isolated 5
      Seq((1L, 2L), (3L, 2L), (1L, 3L), (3L, 4L)).toDF("src", "dst"))
    val got = g.triangleCount.as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 0L))
  }

  test("pageRank via Pregel matches a hand-rolled power iteration") {
    val g = PropertyGraph(
      Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L)).toDF("src", "dst"))
    val got = g.pageRank(maxIter = 10).as[(Long, Double)].collect().toMap
    // reference power iteration with the same push formulation
    val out = Map(1L -> Seq(2L, 3L), 2L -> Seq(3L), 3L -> Seq(1L))
    var pr = Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0)
    for (_ <- 1 to 10) {
      val recv = out.toSeq.flatMap { case (u, vs) => vs.map(_ -> pr(u) / vs.size) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      pr = pr.map { case (v, _) => v -> (0.15 + 0.85 * recv.getOrElse(v, 0.0)) }
    }
    got.foreach { case (v, p) => assert(math.abs(p - pr(v)) < 1e-9, s"vertex $v") }
  }

  test("personalized pageRank matches driver-side dense iteration per source") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
    val g = PropertyGraph((1L to 4L).toDF("id"), edges.toDF("src", "dst"))
    val sources = Seq(1L, 4L)
    val iters = 5
    val got = g.parallelPersonalizedPageRank(sources, iters)
      .as[(Long, Long, Double)].collect()
      .map { case (id, s, r) => (id, s) -> r }.toMap
    // dense reference: rank_{t+1}(v) = 0.15·δ(v=s) + 0.85·Σ rank_t(u)/deg(u)
    val outDeg = edges.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    for (s <- sources) {
      var rank = Map(s -> 1.0).withDefaultValue(0.0)
      for (_ <- 1 to iters) {
        val contrib = edges
          .filter { case (u, _) => rank(u) != 0.0 }
          .groupBy(_._2).view.mapValues(
            _.map { case (u, _) => rank(u) / outDeg(u) }.sum).toMap
        rank = (contrib.keySet + s).map { v =>
          v -> (0.85 * contrib.getOrElse(v, 0.0) + (if (v == s) 0.15 else 0.0))
        }.toMap.withDefaultValue(0.0)
      }
      rank.foreach { case (v, r) =>
        assert(math.abs(got.getOrElse((v, s), 0.0) - r) < 1e-9, s"v=$v s=$s")
      }
    }
    // teleportation personalizes: under source 1 the source dominates; under
    // source 4 (no in-edges, keeps only teleport mass) its out-neighbor 1
    // accumulates the forwarded mass and outranks the farther vertex 2
    assert(got((1L, 1L)) > got((2L, 1L)) && got((1L, 4L)) > got((2L, 4L)))
  }

  test("degrees counts both endpoints") {
    val g = PropertyGraph(
      Seq(1L, 2L, 3L).toDF("id"),
      Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
    val d = g.degrees.as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    assert(g.inDegrees.as[(Long, Long)].collect().toMap == Map(2L -> 1L, 3L -> 2L))
    assert(g.outDegrees.as[(Long, Long)].collect().toMap == Map(1L -> 2L, 2L -> 1L))
  }
}

class ShortestPathsSpec extends SparkTestBase {
  import spark.implicits._

  test("landmark BFS distances on a path-plus-branch graph, unreachable absent") {
    // 1-2-3-4 chain, 3-5 branch, isolated pair 10-11
    val v = Seq(1L, 2L, 3L, 4L, 5L, 10L, 11L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (3L, 5L), (10L, 11L)).toDF("src", "dst")
    val got = PropertyGraph(v, e).shortestPaths(Seq(1L, 10L))
      .select("id", "landmark", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L), (4L, 1L, 3L), (5L, 1L, 3L),
      (10L, 10L, 0L), (11L, 10L, 1L)))
  }

  test("edges count as undirected and multiple landmarks resolve independently") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((3L, 2L), (2L, 1L)).toDF("src", "dst") // reversed directions
    val got = PropertyGraph(v, e).shortestPaths(Seq(1L, 3L))
      .select("id", "landmark", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 2L),
      (3L, 3L, 0L), (2L, 3L, 1L), (1L, 3L, 2L)))
  }

  test("maxIter truncates the frontier expansion") {
    val v = (1L to 6L).toDF("id")
    val e = (1L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = PropertyGraph(v, e).shortestPaths(Seq(1L), maxIter = 2)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L)) // dist <= 2 only
  }
}

class AggregateMessagesSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val g = PropertyGraph(
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w"),
    Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"))

  test("sum of source weights into destinations matches the SQL formulation") {
    val got = g.aggregateMessages
      .sendToDst(Pregel.src("w"))
      .agg(sum(Pregel.msg).as("in_w"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 10L, 3L -> 30L)) // 3 receives 10 + 20
  }

  test("sending both directions computes undirected degree") {
    val got = g.aggregateMessages
      .sendToDst(lit(1L)).sendToSrc(lit(1L))
      .agg(count(Pregel.msg).as("degree"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // and agrees with the dedicated degrees operator on this graph
    val deg = g.degrees.as[(Long, Long)].collect().toMap
    assert(got == deg)
  }

  test("edge attributes are readable in message expressions") {
    val ge = PropertyGraph(
      Seq(Tuple1(1L), Tuple1(2L)).toDF("id"),
      Seq((1L, 2L, 5.0), (1L, 2L, 7.0)).toDF("src", "dst", "amount"))
    val got = ge.aggregateMessages
      .sendToDst(Pregel.edge("amount"))
      .agg(sum(Pregel.msg).as("inflow"))
      .as[(Long, Double)].collect().toMap
    assert(got == Map(2L -> 12.0))
  }
}
