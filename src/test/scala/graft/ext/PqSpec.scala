package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PqSpec extends SparkTestBase {
  import spark.implicits._

  private def randVecs(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
  }

  test("codebook: m*ksub rows, subdim-length centroids, strided seeds") {
    val corpus = randVecs(50, 16, seed = 1)
    val cb = Pq.codebook(corpus, "vec_id", "embedding", dim = 16, m = 4,
      ksub = 8, stride = 5).cache()
    assert(cb.count() == 4L * 8)
    assert(cb.select(size(col("centroid"))).distinct().as[Int].collect().toSeq == Seq(4))
    assert(cb.select("s").distinct().as[Int].collect().sorted.toSeq == (0 until 4))
    assert(cb.select("j").distinct().as[Int].collect().sorted.toSeq == (0 until 8))
  }

  test("encode: seed vectors encode to their own centroid index (d2 = 0)") {
    val corpus = randVecs(40, 16, seed = 2)
    // stride 1: seeds are vec_ids 0..7, so j == vec_id for those rows
    val cb = Pq.codebook(corpus, "vec_id", "embedding", 16, m = 4, ksub = 8, stride = 1)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, 16, m = 4)
      .filter(col("vec_id") < 8)
      .as[(Long, Seq[Int])].collect().toMap
    (0 until 8).foreach { i =>
      assert(codes(i.toLong) == Seq.fill(4)(i),
        s"seed $i should be its own nearest centroid in every subspace")
    }
  }

  test("identity codebook: PQ ranking equals exact L2 ranking") {
    // ksub >= corpus size with stride 1 -> every vector is a centroid, ADC
    // is the quantized true L2^2; top-k must match brute-force L2 exactly
    // (2^-20-scale quantization error is far below gaussian separation)
    val corpus = randVecs(30, 16, seed = 3)
    val qs = corpus.filter(col("vec_id") < 3)
    val got = Pq.topK(corpus, qs, "vec_id", "embedding", k = 4, dim = 16,
      m = 4, ksub = 30, stride = 1)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSet

    val d = corpus.select(col("vec_id"), transform(col("embedding"),
      x => x.cast("double")).as("v")).as[(Long, Seq[Double])].collect().toMap
    def l2sq(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = (0L until 3L).flatMap { q =>
      d.keys.filter(_ != q).toSeq
        .sortBy(n => (l2sq(d(q), d(n)), n)).take(4).zipWithIndex
        .map { case (n, i) => (q, (i + 1).toLong, n) }
    }.toSet
    assert(got == expected)
  }

  test("topK is partitioning-invariant and codes compress to m ints") {
    val corpus = randVecs(60, 16, seed = 4)
    val qs = corpus.filter(col("vec_id") < 4)
    def run(parts: Int) =
      Pq.topK(corpus.repartition(parts), qs, "vec_id", "embedding",
        k = 3, dim = 16, m = 4, ksub = 8, stride = 7)
        .select("query_id", "neighbor_id", "adc", "rank")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(5))

    val cb = Pq.codebook(corpus, "vec_id", "embedding", 16, 4, 8, 7)
    val codes = Pq.encode(corpus, "vec_id", "embedding", cb, 16, 4)
    assert(codes.select(size(col("codes"))).distinct().as[Int].collect().toSeq == Seq(4))
  }

  test("trained codebook reduces quantization error; trained topK recovers clusters") {
    // 8 well-separated cluster centers in 16-dim, 10 members each with
    // small jitter: k-means should land near the true centers and beat the
    // strided init's error substantially
    val rnd = new scala.util.Random(9)
    val centers = Array.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat * 10f))
    val corpus = Seq.tabulate(80) { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")

    def errOf(cb: org.apache.spark.sql.DataFrame): Double =
      Pq.quantizationError(corpus, "vec_id", "embedding", cb, dim = 16, m = 4)
        .select("total_sq_error").as[Double].collect().head
    val init = Pq.codebook(corpus, "vec_id", "embedding", 16, m = 4, ksub = 8, stride = 1)
    val trained = Pq.trainCodebook(corpus, "vec_id", "embedding", 16,
      m = 4, ksub = 8, stride = 1, iters = 5)
    val (e0, e1) = (errOf(init), errOf(trained))
    assert(e1 < e0 * 0.5, s"training should at least halve the error: $e0 -> $e1")

    // trained search: each query's top-3 must come from its own cluster
    val qs = corpus.filter(col("vec_id") < 4)
    val top = Pq.topK(corpus, qs, "vec_id", "embedding", k = 3, dim = 16,
      m = 4, ksub = 8, stride = 1, trainedCodebook = Some(trained))
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top.length == 12)
    top.foreach { case (q, n) =>
      assert(n % 8 == q % 8, s"neighbor $n of query $q is from another cluster")
    }
  }

  test("pq_adc: hand-computed lookup sum; rejects out-of-range codes") {
    val df = Seq((Array(1, 0), Array(10L, 20L, 30L, 40L))).toDF("codes", "table")
    // m=2, ksub=2: table[0*2+1] + table[1*2+0] = 20 + 30
    val got = df.select(call_function("pq_adc", col("codes"), col("table")))
      .as[Long].collect().head
    assert(got == 50L)

    val bad = Seq((Array(2, 0), Array(10L, 20L, 30L, 40L))).toDF("codes", "table")
    val e = intercept[Exception] {
      bad.select(call_function("pq_adc", col("codes"), col("table"))).collect()
    }
    assert(e.getMessage.contains("out of range") ||
      e.getCause != null && e.getCause.getMessage.contains("out of range"))
  }
}
