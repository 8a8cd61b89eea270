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
