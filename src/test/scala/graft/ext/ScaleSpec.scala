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
}
