package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class KTrussSpec extends SparkTestBase {
  import spark.implicits._

  private def graph(edges: Seq[(Long, Long)]): PropertyGraph = {
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id")
    PropertyGraph(verts, edges.toDF("src", "dst"))
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for (i <- ids; j <- ids if i < j) yield (i, j)

  test("K4 is a 4-truss; K4 minus an edge collapses at k=4") {
    val k4 = graph(clique(1L to 4L))
    // K4: every edge sits in 2 triangles → survives k=4 (support ≥ 2)
    val got = KTruss.run(k4, k = 4).orderBy("a", "b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(e => (e._1, e._2)) == clique(1L to 4L))
    assert(got.forall(_._3 == 2L))
    // remove one edge: two edges drop to support 1, cascade kills all
    assert(KTruss.run(graph(clique(1L to 4L).tail), k = 4).count() == 0)
  }

  test("3-truss keeps exactly the triangle edges, drops pendants") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)) // pendant 3-4
    val got = KTruss.run(graph(tri), k = 3).orderBy("a", "b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("cascade: a chain of triangles sharing single edges dies at k=4") {
    // two triangles glued on edge (2,3): every edge has support 1 except
    // the shared edge (support 2) — k=4 needs ≥2 everywhere → one round
    // kills the outer edges, the next kills the bare shared edge
    val glued = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(KTruss.run(graph(glued), k = 4).count() == 0)
    assert(KTruss.lastRounds.get.toInt >= 2)
  }

  test("k-truss is contained in the (k-1)-core") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)(
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2)
    val g = graph(edges)
    val trussVerts = KTruss.run(g, k = 4)
      .select(explode(array(col("a"), col("b"))).as("id"))
      .distinct().as[Long].collect().toSet
    val coreVerts = KCore.run(g, k = 3)
      .select("id").as[Long].collect().toSet
    assert(trussVerts.subsetOf(coreVerts))
  }

  test("orientation and multi-edges are normalized away") {
    val a = KTruss.run(graph(Seq((1L, 2L), (2L, 3L), (1L, 3L))), 3).collect()
    val b = KTruss.run(graph(Seq((2L, 1L), (3L, 2L), (3L, 1L), (1L, 3L))), 3)
      .collect()
    assert(a.toSeq.sortBy(_.getLong(0)) == b.toSeq.sortBy(_.getLong(0)))
  }
}
