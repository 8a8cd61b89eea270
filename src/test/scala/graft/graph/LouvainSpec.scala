package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Properties of the synchronous exact-integer Louvain phase 1. */
class LouvainSpec extends SparkTestBase {
  import spark.implicits._

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (x <- ids; y <- ids if x < y) yield (x, y)

  test("phase1: two cliques bridged by one edge separate into two communities") {
    val edges = (clique(1L to 5L) ++ clique(11L to 15L) :+ (5L, 11L))
      .toDF("src", "dst")
    val labels = Louvain.phase1(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    val left = (1L to 5L).map(labels)
    val right = (11L to 15L).map(labels)
    assert(left.distinct.size == 1, s"left clique split: $left")
    assert(right.distinct.size == 1, s"right clique split: $right")
    assert(left.head != right.head, "bridge merged the cliques")
  }

  test("phase1: deterministic and partitioning-invariant") {
    val rnd = new scala.util.Random(31)
    val edges = Seq.fill(400)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Louvain.phase1(edges, 2).orderBy("v").collect().toSeq
    val b = Louvain.phase1(edges.repartition(13), 2).orderBy("v").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("phase1: an isolated-pair vertex joins its only neighbor") {
    // single edge: both endpoints must end in one community after 1 round
    // (each moves toward the other; smallest-id tie-break converges them)
    val edges = Seq((7L, 3L)).toDF("src", "dst")
    val labels = Louvain.phase1(edges, 2).as[(Long, Long)].collect().toMap
    assert(labels(3L) == labels(7L))
  }

  test("communityStats: hand-checked internal edges, degree mass, modularity") {
    // triangle {1,2,3} + pendant 4 attached to 3; force labels by hand
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)).toDF("v", "c")
    val got = Louvain.communityStats(edges, labels)
      .orderBy("community")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // m=4; community 1: 3 members, 3 internal edges, degree sum 2+2+3=7
    // community 4: 1 member, 0 internal, degree 1
    val q1 = math.rint((3.0 / 4 - math.pow(7.0 / 8, 2)) * 1e8) / 1e8
    val q4 = math.rint((0.0 / 4 - math.pow(1.0 / 8, 2)) * 1e8) / 1e8
    assert(got == Seq((1L, 3L, 3L, 7L, q1), (4L, 1L, 0L, 1L, q4)))
  }

  test("run: modularity is non-decreasing across levels") {
    // ring of 6 cliques, adjacent cliques bridged — level 1 finds the
    // cliques, level 2 can only merge whole cliques (or keep them), so
    // each level's labeling must score at least the previous one's
    val cliques = (0 until 6).map(i => clique((i * 10 + 1L) to (i * 10 + 4L)))
    val bridges = (0 until 6).map(i => (i * 10 + 4L, ((i + 1) % 6) * 10 + 1L))
    val edges = (cliques.flatten ++ bridges).toDF("src", "dst")
    def q(labels: org.apache.spark.sql.DataFrame): Double = Louvain
      .communityStats(edges, labels)
      .agg(sum("modularity_part")).as[Double].collect().head
    val qs = (1 to 3).map(lv => q(Louvain.run(edges, roundsPerLevel = 2, levels = lv)))
    qs.sliding(2).foreach { case Seq(a, b) =>
      assert(b >= a - 1e-9, s"modularity decreased across levels: $qs")
    }
    // and the multi-level result beats (or ties) plain phase 1
    assert(qs.last >= q(Louvain.phase1(edges, 2)) - 1e-9)
  }

  test("run: level-1-only run equals phase1 on the same schedule") {
    val rnd = new scala.util.Random(43)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    val a = Louvain.run(edges, roundsPerLevel = 2, levels = 1)
      .orderBy("v").collect().toSeq
    val b = Louvain.phase1(edges, 2).orderBy("v").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("contract: level invariance — contracted identity keeps modularity") {
    // Q of (graph, labels) == Q of (contracted graph, identity labels):
    // internal mass moves to self-loops, degree/m conventions must agree
    val edges = (clique(1L to 4L) ++ clique(11L to 14L) :+ (4L, 11L))
      .toDF("src", "dst")
    val labels = Louvain.phase1(edges, 4)
    val wund = Louvain.contract(
      edges.select(least($"src", $"dst").as("a"),
        greatest($"src", $"dst").as("b"))
        .where($"a" =!= $"b").distinct().withColumn("w", lit(1L)),
      labels)
    // weighted modularity of the contracted graph under identity labels,
    // computed by hand from the weighted convention (self 2w in degree)
    val rows = wund.as[(Long, Long, Long)].collect()
    val m = rows.map(_._3).sum.toDouble
    val degs = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    rows.foreach { case (a, b, w) =>
      if (a == b) degs(a) += 2 * w else { degs(a) += w; degs(b) += w }
    }
    val selfW = rows.filter(r => r._1 == r._2).map(r => r._1 -> r._3).toMap
    val qContracted = degs.keys.toSeq.map { c =>
      selfW.getOrElse(c, 0L) / m - math.pow(degs(c) / (2 * m), 2)
    }.sum
    val qOrig = Louvain.communityStats(edges, labels)
      .agg(sum("modularity_part")).as[Double].collect().head
    assert(math.abs(qContracted - qOrig) < 1e-6,
      s"level invariance broken: orig=$qOrig contracted=$qContracted")
  }

  test("phase1: beats the singleton partition's modularity") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).toDF("src", "dst")
    def q(labels: org.apache.spark.sql.DataFrame): Double = Louvain
      .communityStats(edges, labels)
      .agg(sum("modularity_part")).as[Double].collect().head
    val singleton = Louvain.phase1(edges, 1).select(col("v"), col("v").as("c"))
    assert(q(Louvain.phase1(edges, 4)) > q(singleton),
      "phase1 did not improve over singletons")
  }
}

class LouvainStrategyParitySpec extends SparkTestBase {
  import spark.implicits._

  // Three 4-cliques bridged in a line plus a pendant vertex — enough
  // structure for two levels to act on.
  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (a <- ids; b <- ids if a < b) yield (a, b)
  private val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
    clique(Seq(11L, 12L, 13L, 14L)) ++ clique(Seq(21L, 22L, 23L, 24L)) ++
    Seq((4L, 11L), (14L, 21L), (24L, 30L))).toDF("src", "dst")

  private def louvainWith(confs: Map[String, String]): Map[Long, Long] = {
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try Louvain.run(edges, roundsPerLevel = 2, levels = 2)
      .as[(Long, Long)].collect().toMap
    finally confs.keys.foreach(spark.conf.unset)
  }

  test("broadcast gate and partition collapse do not change the labeling") {
    val base = louvainWith(Map.empty)
    // the derandomized schedule is engine-deterministic, so the at-scale
    // shuffle-join plan (threshold 0) and the no-collapse plan must agree
    // bit-for-bit with the gated default
    val arms = Seq(
      Map("spark.graft.louvain.broadcastThreshold" -> "0"),
      Map("spark.graft.louvain.smallPartitions" -> "0"),
      Map("spark.graft.louvain.broadcastThreshold" -> "0",
        "spark.graft.louvain.smallPartitions" -> "0"),
      // overflow-safe arm: the decimal(38,0) score (what auto picks at
      // m ≥ 2³⁰, where contracted-level Long scores can wrap) must pick
      // the identical argmax everywhere the Long score is exact
      Map("spark.graft.louvain.decimalScore" -> "true"))
    arms.foreach { confs =>
      assert(louvainWith(confs) == base, s"labeling diverged under $confs")
    }
  }
}
