package graft.ext

import graft.SparkTestBase

class RetrievalSpec extends SparkTestBase {
  import spark.implicits._

  test("rrfFuse: hand-checked fusion, missing-ranker coalesce, ordering") {
    // query 1: doc 10 is #1 lexically and #2 densely; doc 20 only dense #1;
    // doc 30 only lexical #2
    val lex = Seq((1L, 10L, 1L), (1L, 30L, 2L)).toDF("query_id", "doc_id", "rank")
    val den = Seq((1L, 20L, 1L), (1L, 10L, 2L)).toDF("query_id", "doc_id", "rank")
    val got = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> den), k0 = 60, topK = 10)
      .orderBy("rank")
      .select("doc_id", "rrf").as[(Long, Double)].collect().toSeq
    val s10 = 1.0 / 61 + 1.0 / 62
    val s20 = 1.0 / 61
    val s30 = 1.0 / 62
    assert(got == Seq((10L, s10), (20L, s20), (30L, s30)))
  }

  test("rrfFuse: equal scores tie-break by doc_id, topK bounds output") {
    // both docs rank #1 in exactly one ranker -> identical rrf; doc 5 wins
    val lex = Seq((1L, 9L, 1L)).toDF("query_id", "doc_id", "rank")
    val den = Seq((1L, 5L, 1L)).toDF("query_id", "doc_id", "rank")
    val both = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> den))
      .orderBy("rank").select("doc_id").as[Long].collect().toSeq
    assert(both == Seq(5L, 9L))
    val top1 = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> den), topK = 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(top1 == Seq(5L))
  }

  test("rrfFuse: partitioning-invariant") {
    val rnd = new scala.util.Random(91)
    val lex = (1 to 5).flatMap(q => (1 to 20).map(r =>
      (q.toLong, rnd.nextInt(50).toLong + 100 * q, r.toLong)))
      .toDF("query_id", "doc_id", "rank")
    val den = (1 to 5).flatMap(q => (1 to 20).map(r =>
      (q.toLong, rnd.nextInt(50).toLong + 100 * q, r.toLong)))
      .toDF("query_id", "doc_id", "rank")
    val a = Retrieval.rrfFuse(Seq("lex" -> lex, "dense" -> den))
      .orderBy("query_id", "rank").collect().toSeq
    val b = Retrieval.rrfFuse(Seq("lex" -> lex.repartition(7),
        "dense" -> den.repartition(3)))
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rrfFuse: duplicate ranker names rejected at the call site") {
    val df = Seq((1L, 1L, 1L)).toDF("query_id", "doc_id", "rank")
    val e = intercept[IllegalArgumentException] {
      Retrieval.rrfFuse(Seq("lex" -> df, "lex" -> df))
    }
    assert(e.getMessage.contains("distinct"))
  }
}
