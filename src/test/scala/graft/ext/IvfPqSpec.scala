package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IvfPqSpec extends SparkTestBase {
  import spark.implicits._

  // contiguous id blocks per cluster, so id-strided coarse centroids land
  // one per cluster (cluster of id = id / perCluster)
  private def clustered(nClusters: Int, perCluster: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    val centers = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat * 10f))
    Seq.tabulate(nClusters * perCluster) { i =>
      val c = centers(i / perCluster)
      (i.toLong, c.map(x => x + rnd.nextGaussian().toFloat * 0.1f))
    }.toDF("vec_id", "embedding")
  }

  test("shape: k rows per query with ranks 1..k, neighbors never the query") {
    val corpus = clustered(6, 12, 16, seed = 21)
    val qs = corpus.filter(col("vec_id") < 3)
    val got = IvfPq.topK(corpus, qs, "vec_id", "embedding", k = 4, dim = 16,
      m = 4, ksub = 8, ivfStride = 9, seedStride = 9, nProbe = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(got.length == 12)
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to 4L))
      assert(!rows.exists(_._2 == q))
    }
  }

  test("probing more lists can only improve the best ADC distance") {
    val corpus = clustered(6, 12, 16, seed = 22)
    val qs = corpus.filter(col("vec_id") < 4)
    def best(nProbe: Int): Map[Long, Long] =
      IvfPq.topK(corpus, qs, "vec_id", "embedding", k = 1, dim = 16,
        m = 4, ksub = 8, ivfStride = 9, seedStride = 9, nProbe = nProbe)
        .select("query_id", "adc").as[(Long, Long)].collect().toMap
    val (one, four) = (best(1), best(4))
    one.keySet.foreach { q => assert(four(q) <= one(q),
      s"query $q: widening probes worsened best adc ${one(q)} -> ${four(q)}") }
  }

  test("probe-all on well-separated clusters retrieves own-cluster neighbors") {
    // stride 10 over contiguous 10-id cluster blocks -> one coarse centroid
    // per cluster, so every list IS a cluster; probing all lists with a
    // residual codebook must rank own-cluster members first (inter-cluster
    // distance ~ 10 vs intra ~ 0.1, far beyond quantization error)
    val corpus = clustered(8, 10, 16, seed = 23)
    val qs = corpus.filter(col("vec_id") < 4)
    val got = IvfPq.topK(corpus, qs, "vec_id", "embedding", k = 3, dim = 16,
      m = 4, ksub = 8, ivfStride = 10, seedStride = 10, nProbe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    got.foreach { case (q, n) =>
      assert(n / 10 == q / 10, s"neighbor $n of query $q is from another cluster")
    }
  }

  test("partitioning-invariant") {
    val corpus = clustered(5, 10, 16, seed = 24)
    val qs = corpus.filter(col("vec_id") < 3)
    def run(parts: Int) =
      IvfPq.topK(corpus.repartition(parts), qs, "vec_id", "embedding", k = 3,
        dim = 16, m = 4, ksub = 8, ivfStride = 7, seedStride = 7, nProbe = 3)
        .select("query_id", "neighbor_id", "adc", "rank")
        .as[(Long, Long, Long, Long)].collect().toSet
    assert(run(1) == run(6))
  }

  test("rerank: results come from the ADC shortlist, ordered by exact cosine") {
    val corpus = clustered(6, 12, 16, seed = 25)
    val qs = corpus.filter(col("vec_id") < 3)
    val short = IvfPq.topK(corpus, qs, "vec_id", "embedding", k = 10,
        dim = 16, m = 4, ksub = 8, ivfStride = 9, seedStride = 9, nProbe = 3)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = IvfPq.topKReranked(corpus, qs, "vec_id", "embedding", k = 4,
        shortlist = 10, dim = 16, m = 4, ksub = 8, ivfStride = 9,
        seedStride = 9, nProbe = 3)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length == 12)
    assert(got.forall(r => short.contains((r._1, r._2))))
    got.groupBy(_._1).values.foreach { rows =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._3).toSeq == rows.map(_._3).sorted.reverse.toSeq)
    }
  }

  test("rerank with probe-all + corpus-sized shortlist == brute-force top-k") {
    // shortlist covering the whole corpus and every list probed: the ADC
    // stage filters nothing, so exact re-rank must equal brute force
    val corpus = clustered(5, 10, 16, seed = 26)
    val qs = corpus.filter(col("vec_id") < 3)
    val brute = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding", 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    val rr = IvfPq.topKReranked(corpus, qs, "vec_id", "embedding", k = 4,
        shortlist = 50, dim = 16, m = 4, ksub = 8, ivfStride = 10,
        seedStride = 10, nProbe = 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(rr == brute)
  }
}
