package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SkewJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals plain join on skewed data") {
    // 90% of facts hit one hot key
    val facts = ((1 to 900).map(i => (1L, s"f$i")) ++ (1 to 100).map(i => ((i % 7 + 2).toLong, s"g$i")))
      .toDF("k", "payload")
    val dim = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = facts.join(dim, "k").select("k", "payload", "attr")
      .as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.salted(facts, dim, "k", salt = 8)
      .select("k", "payload", "attr").as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }
}

class IvfSpec extends SparkTestBase {

  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("every corpus vector lands in exactly one list, owned by a centroid") {
    val assigned = Ivf.assign(emb, "vec_id", "embedding", stride = 50)
    assert(assigned.count() == emb.count())
    val lists = assigned.select("list_id").distinct()
    assert(lists.join(emb.filter(col("vec_id") % 50 === 0),
      lists("list_id") === col("vec_id"), "left_anti").count() == 0)
  }

  test("probing all lists equals brute force exactly") {
    import spark.implicits._
    val queries = emb.filter(col("vec_id") < 4)
    val nLists = emb.filter(col("vec_id") % 50 === 0).count().toInt
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val ivfAll = Ivf.topK(emb, queries, "vec_id", "embedding", 3, stride = 50, nProbe = nLists)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(ivfAll == brute)
    // narrow probe returns a valid, smaller-or-equal candidate ranking
    val ivf2 = Ivf.topK(emb, queries, "vec_id", "embedding", 3, stride = 50, nProbe = 2)
    assert(ivf2.count() <= brute.size)
    assert(ivf2.filter(col("rank") > 3).count() == 0)
  }

  test("k-means training recovers planted direction clusters") {
    import spark.implicits._
    // three well-separated directions in R^4, 20 noisy members each; ids
    // arranged so the stride-20 init picks one seed per planted cluster
    val dirs = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val rnd = new scala.util.Random(11)
    val rows = for {
      c <- dirs.indices
      i <- 0 until 20
    } yield (c * 20L + i, dirs(c).map(x => x + rnd.nextGaussian() * 0.05))
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Ivf.trainCentroids(corpus, "vec_id", "embedding", stride = 20, iters = 4)
    assert(cents.count() == 3)
    val assigned = Ivf.assignTo(corpus, cents, "vec_id", "embedding")
      .select(col("vec_id"), col("list_id")).as[(Long, Long)].collect()
    // every planted cluster maps to exactly one list, and lists don't mix
    val byCluster = assigned.groupBy(_._1 / 20).map { case (c, xs) => c -> xs.map(_._2).toSet }
    assert(byCluster.values.forall(_.size == 1), s"mixed cluster: $byCluster")
    assert(byCluster.values.flatten.toSet.size == 3)
    // trained centroids align with the planted directions (cosine > 0.99)
    val aligned = cents.as[(Long, Seq[Double])].collect().map { case (_, cv) =>
      dirs.map(d => d.zip(cv).map(t => t._1 * t._2).sum /
        (math.sqrt(d.map(x => x * x).sum) * math.sqrt(cv.map(x => x * x).sum))).max
    }
    assert(aligned.forall(_ > 0.99), s"centroid alignment: ${aligned.toSeq}")
  }

  test("k-means keeps previous centroid for a cluster that empties; trained probe-all equals brute force") {
    import spark.implicits._
    // second seed (id 20) is a far-away direction nobody joins after iter 1
    val rows = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.95, 0.05)),
      (20L, Seq(-1.0, 0.0)))
    val corpus = rows.toDF("vec_id", "embedding")
    val cents = Ivf.trainCentroids(corpus, "vec_id", "embedding", stride = 20, iters = 3)
    assert(cents.count() == 2) // both survive even if one list empties
    val queries = corpus.filter(col("vec_id") === 0L)
    val brute = Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val trained = Ivf.topKTrained(corpus, queries, cents, "vec_id", "embedding", 2, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(trained == brute)
  }
}
