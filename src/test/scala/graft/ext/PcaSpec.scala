package graft.ext

import graft.SparkTestBase

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  test("scatterMatrix: hand-checked 2x2 second moments") {
    val vecs = Seq(
      Array(1.0f, 2.0f), Array(3.0f, -1.0f)
    ).toDF("embedding")
    val got = Pca.scatterMatrix(vecs, "embedding", scale = 1)
      .orderBy("i", "j").as[(Long, Long, Long)].collect().toSeq
    // q rows: (1,2), (3,-1): s00=1+9, s01=2-3, s11=4+1
    assert(got == Seq((0L, 0L, 10L), (0L, 1L, -1L), (1L, 1L, 5L)))
  }

  test("scatterMatrix: partitioning-invariant exact sums") {
    val rnd = new scala.util.Random(79)
    val vecs = Seq.fill(300)(Array.fill(8)(rnd.nextFloat() * 2 - 1))
      .toDF("embedding")
    val a = Pca.scatterMatrix(vecs, "embedding").orderBy("i", "j")
      .collect().toSeq
    val b = Pca.scatterMatrix(vecs.repartition(11), "embedding")
      .orderBy("i", "j").collect().toSeq
    assert(a == b && a.size == 8 * 9 / 2)
  }

  test("topComponent: recovers a planted dominant direction") {
    val rnd = new scala.util.Random(83)
    // points stretched 10x along the (1,1,0,...)/sqrt(2) direction
    val vecs = Seq.fill(500) {
      val t = (rnd.nextFloat() * 2 - 1) * 10
      val noise = Array.fill(8)((rnd.nextFloat() * 2 - 1) * 0.3f)
      Array.tabulate(8)(i => noise(i) +
        (if (i == 0 || i == 1) (t / math.sqrt(2)).toFloat else 0f))
    }.toDF("embedding")
    val comp = Pca.topComponent(Pca.scatterMatrix(vecs, "embedding"))
    val target = Array.tabulate(8)(i =>
      if (i < 2) 1.0 / math.sqrt(2) else 0.0)
    val cosine = comp.zip(target).map { case (a, b) => a * b }.sum
    assert(math.abs(cosine) > 0.99, s"component off target: cos=$cosine")
  }

  test("project: scores carry more variance than any single axis") {
    val rnd = new scala.util.Random(89)
    val rows = (1 to 400).map { id =>
      val t = (rnd.nextFloat() * 2 - 1) * 5
      (id.toLong, Array.tabulate(4)(i =>
        (if (i == 2) t else (rnd.nextFloat() * 2 - 1) * 0.2).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val comp = Pca.topComponent(Pca.scatterMatrix(df, "embedding"))
    val scores = Pca.project(df, "vec_id", "embedding", comp)
      .as[(Long, Double)].collect().map(_._2)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val axisVars = (0 until 4).map { i =>
      variance(rows.map(_._2(i).toDouble))
    }
    assert(variance(scores.toSeq) >= axisVars.max * 0.99,
      s"projection variance below best axis")
  }
}
