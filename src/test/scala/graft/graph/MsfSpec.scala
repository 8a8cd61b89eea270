package graft.graph

import org.apache.spark.sql.DataFrame

import graft.SparkTestBase

class MsfSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference Kruskal with union-find, same (w, a, b) total order. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val canon = edges.map { case (s, d, w) => (math.min(s, d), math.max(s, d), w) }
      .filter(e => e._1 != e._2)
      .groupBy(e => (e._1, e._2)).map { case ((a, b), es) => (a, b, es.map(_._3).min) }
    canon.toSeq.sortBy(e => (e._3, e._1, e._2)).flatMap { case (a, b, w) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet
  }

  private def randomGraph(n: Int, m: Int, seed: Int): Seq[(Long, Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    (1 to m).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, rnd.nextInt(40).toLong)
    }
  }

  private def run(edges: Seq[(Long, Long, Long)], rounds: Int = 0,
      parts: Int = 4): DataFrame =
    MinSpanningForest.boruvka(
      edges.toDF("src", "dst", "w").repartition(parts), "w", rounds)

  test("boruvka to convergence equals Kruskal under the (w,a,b) order") {
    val edges = randomGraph(60, 200, seed = 11)
    val got = run(edges).as[(Long, Long, Long)].collect().toSet
    assert(got == kruskal(edges))
  }

  test("forest law: |MSF| = n - components, duplicate weights welcome") {
    // many duplicate weights -> the tie-break must still produce a forest
    val edges = randomGraph(80, 300, seed = 12).map { case (s, d, _) =>
      (s, d, 7L)
    }
    val got = run(edges).as[(Long, Long, Long)].collect().toSet
    val verts = edges.flatMap(e => Seq(e._1, e._2)).toSet
    // components via the forest itself cross-checked with union-find
    val k = kruskal(edges)
    assert(got.size == k.size) // same count: n - c for the same graph
    // acyclicity: union-find over got never sees a redundant edge
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    got.foreach { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      assert(ra != rb, s"cycle at ($a,$b)"); parent(ra) = rb
    }
    assert(verts.nonEmpty && got.size < verts.size)
  }

  test("early rounds only ever pick final-forest edges (cut property)") {
    val edges = randomGraph(70, 220, seed = 13)
    val full = run(edges).as[(Long, Long, Long)].collect().toSet
    val two = run(edges, rounds = 2).as[(Long, Long, Long)].collect().toSet
    assert(two.nonEmpty && two.subsetOf(full))
  }

  test("partitioning-invariant") {
    val edges = randomGraph(50, 150, seed = 14)
    val a = run(edges, parts = 1).as[(Long, Long, Long)].collect().toSet
    val b = run(edges, parts = 13).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }
}
