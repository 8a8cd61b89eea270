package graft.graph

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The float-fixpoint PageRank/HITS variants (GraphFrames-parity surface;
  * non-oracled by design — float shuffle-order sums cannot be hash-gated,
  * so the cross-engine gate stays on the integer forms). Verified against
  * driver-side reference power iterations on collected small graphs. */
class FloatCentralitySpec extends SparkTestBase {
  import spark.implicits._

  private def edgesDf(es: Seq[(Long, Long)]) = es.toDF("src", "dst")

  private def refPageRank(es: Seq[(Long, Long)], reset: Double,
      iters: Int): Map[Long, Double] = {
    val e = es.filter(p => p._1 != p._2).distinct
    val verts = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val out = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var pr = verts.map(_ -> 1.0).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).view
        .mapValues(_.map(p => pr(p._1) / out(p._1)).sum).toMap
      pr = verts.map(v => v -> (reset + (1 - reset) * in.getOrElse(v, 0.0))).toMap
    }
    pr
  }

  test("pageRank converges to the reference power-iteration fixpoint") {
    val rnd = new scala.util.Random(47)
    val es = Seq.fill(250)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val got = Centrality.pageRank(edgesDf(es), tol = 1e-7, maxIter = 60)
      .as[(Long, Double)].collect().toMap
    val ref = refPageRank(es, 0.15, 200)
    assert(got.keySet == ref.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - ref(v)) < 1e-5, s"v=$v got=$p ref=${ref(v)}")
    }
  }

  test("pageRank: tol convergence is partitioning-robust within tolerance") {
    val rnd = new scala.util.Random(53)
    val es = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).distinct
    val a = Centrality.pageRank(edgesDf(es), tol = 1e-8, maxIter = 80)
      .as[(Long, Double)].collect().toMap
    val b = Centrality.pageRank(edgesDf(es).repartition(13), tol = 1e-8, maxIter = 80)
      .as[(Long, Double)].collect().toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    a.foreach { case (v, p) => assert(math.abs(p - b(v)) < 1e-6) }
  }

  test("pageRank ranking agrees with pageRankInt on a clear hub graph") {
    // star into vertex 1 plus a weak tail: 1 must dominate in both forms
    val es = (2L to 12L).map(v => (v, 1L)) ++ Seq((1L, 2L), (2L, 3L))
    val fl = Centrality.pageRank(edgesDf(es), tol = 1e-8, maxIter = 60)
      .orderBy(desc("pr")).as[(Long, Double)].collect()
    val fx = Centrality.pageRankInt(edgesDf(es), rounds = 16)
      .orderBy(desc("pr")).as[(Long, Long)].collect()
    assert(fl.head._1 == 1L && fx.head._1 == 1L)
    assert(fl(1)._1 == 2L && fx(1)._1 == 2L) // 1's only successor is next
  }

  test("hitsFloat: pure hub and pure authority separate; L2 norms are 1") {
    // bipartite: 1,2,3 point at 11,12 — hubs left, authorities right
    val es = for (h <- 1L to 3L; a <- 11L to 12L) yield (h, a)
    val got = Centrality.hitsFloat(edgesDf(es), tol = 1e-9, maxIter = 50)
      .as[(Long, Double, Double)].collect()
    val (hubs, auths) = got.partition(_._1 <= 3L)
    hubs.foreach { case (_, h, a) => assert(h > 0.5 && a == 0.0) }
    auths.foreach { case (_, h, a) => assert(h == 0.0 && a > 0.6) }
    val hNorm = math.sqrt(got.map(r => r._2 * r._2).sum)
    val aNorm = math.sqrt(got.map(r => r._3 * r._3).sum)
    assert(math.abs(hNorm - 1.0) < 1e-6 && math.abs(aNorm - 1.0) < 1e-6)
  }

  test("hitsFloat ranking agrees with integer hits on a skewed graph") {
    val rnd = new scala.util.Random(59)
    val es = (Seq.fill(150)((rnd.nextInt(25).toLong, rnd.nextInt(8).toLong)) ++
      Seq.fill(60)((rnd.nextInt(25).toLong, 8L + rnd.nextInt(17).toLong)))
      .filter(p => p._1 != p._2).distinct
    val fl = Centrality.hitsFloat(edgesDf(es), tol = 1e-9, maxIter = 60)
      .orderBy(desc("authority"), asc("id")).as[(Long, Double, Double)]
      .collect().map(_._1).take(3).toSet
    val fx = Centrality.hits(edgesDf(es), rounds = 8)
      .orderBy(desc("authority"), asc("id")).as[(Long, Long, Long)]
      .collect().map(_._1).take(3).toSet
    // top-3 authorities by both scoring schemes overlap on a skewed graph
    assert((fl intersect fx).size >= 2, s"float=$fl int=$fx")
  }
}
