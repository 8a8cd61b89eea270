package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class ApproxTopKSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(rows: Seq[String], k: Int): Map[String, Long] =
    rows.toDF("w")
      .repartition(4) // force partial sketches + a merge tree
      .agg(call_function("approx_top_k", col("w"), lit(k)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lb"))
      .as[(String, Long)].collect().toMap

  test("every item above the n/(k+1) threshold is present with a valid lower bound") {
    // 600 a, 300 b, 100 c, 200 distinct noise -> n = 1200
    val rows = Seq.fill(600)("a") ++ Seq.fill(300)("b") ++ Seq.fill(100)("c") ++
      (1 to 200).map(i => s"noise$i")
    val n = rows.size
    for (k <- Seq(5, 20, 100)) {
      val sk = sketch(rows, k)
      assert(sk.size <= k)
      val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // guarantee 1: no false negatives above the threshold
      exact.filter { case (_, c) => c > n.toLong / (k + 1) }.keys.foreach { item =>
        assert(sk.contains(item), s"k=$k lost heavy item $item")
      }
      // guarantee 2: count_lb in (true - n/(k+1), true]
      sk.foreach { case (item, lb) =>
        val t = exact(item)
        assert(lb <= t && lb >= t - n.toDouble / (k + 1), s"k=$k $item lb=$lb true=$t")
      }
    }
  }

  test("exact when distinct items fit in k counters") {
    val rows = Seq.fill(7)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    assert(sketch(rows, 10) == Map("x" -> 7L, "y" -> 3L, "z" -> 1L))
  }

  test("nulls are ignored and output is sorted by count desc then item") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("w")
    val out = df.agg(call_function("approx_top_k", col("w"), lit(4)).as("sk"))
      .select(explode(col("sk")).as("e"))
      .select(col("e.item"), col("e.count_lb")).as[(String, Long)].collect().toSeq
    assert(out == Seq(("a", 2L), ("b", 1L)))
  }

  test("grouped sketches aggregate per group") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z"))
      .toDF("g", "w")
    val out = df.groupBy("g")
      .agg(call_function("approx_top_k", col("w"), lit(8)).as("sk"))
      .select(col("g"), explode(col("sk")).as("e"))
      .select(col("g"), col("e.item"), col("e.count_lb"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("g1", "a", 2L), ("g1", "b", 1L), ("g2", "z", 1L)))
  }
}

class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def shingles(text: String, n: Int): Seq[String] =
    Seq(text).toDF("t")
      .select(explode(call_function("word_shingles", col("t"), lit(n))).as("sh"))
      .as[String].collect().toSeq

  test("produces every consecutive n-gram in order, duplicates kept") {
    assert(shingles("a b a b a", 2) == Seq("a b", "b a", "a b", "b a"))
    assert(shingles("One Two THREE", 1) == Seq("one", "two", "three"))
    assert(shingles("a b", 3) == Seq.empty)
  }

  test("tokenization matches split(lower(text), '\\s+') exactly, leading empty included") {
    val text = "  Leading  WS\tand\nmixed"
    val viaSplit = Seq(text).toDF("t")
      .select(split(lower(col("t")), "\\s+").as("w")).as[Seq[String]].head()
    assert(shingles(text, 1) == viaSplit)
  }

  test("approx_top_k rejects non-string input at analysis time") {
    val err = intercept[Exception] {
      spark.range(5).agg(call_function("approx_top_k", col("id"), lit(3))).collect()
    }
    assert(err.getMessage.contains("STRING"), err.getMessage)
  }

  test("approx_top_k rejects k <= 0 and non-constant k with clear messages") {
    val bad = intercept[Exception] {
      Seq("a").toDF("w").agg(call_function("approx_top_k", col("w"), lit(0))).collect()
    }
    assert(bad.getMessage.contains("k must be >= 1"), bad.getMessage)
    val nonConst = intercept[Exception] {
      Seq("a").toDF("w")
        .agg(call_function("approx_top_k", col("w"), length(col("w")))).collect()
    }
    assert(nonConst.getMessage.contains("constant"), nonConst.getMessage)
  }

  test("word_shingles validates arity and constant n at analysis time") {
    val arity = intercept[Exception] {
      Seq("a b").toDF("t").select(call_function("word_shingles", col("t"))).collect()
    }
    assert(arity.getMessage.contains("takes 2 arguments"), arity.getMessage)
    val nonConst = intercept[Exception] {
      Seq("a b").toDF("t")
        .select(call_function("word_shingles", col("t"), length(col("t")))).collect()
    }
    assert(nonConst.getMessage.contains("constant"), nonConst.getMessage)
    val zero = intercept[Exception] {
      Seq("a b").toDF("t")
        .select(call_function("word_shingles", col("t"), lit(0))).collect()
    }
    assert(zero.getMessage.contains("n must be >= 1"), zero.getMessage)
  }

  test("simhash_agg over zero rows / all-null input yields 0, not all-ones") {
    // matches the relational formulation: 64 conditional sums of an empty
    // set are all 0 -> fingerprint 0
    val empty = Seq.empty[Long].toDF("h")
      .agg(call_function("simhash_agg", col("h"))).as[Long].head()
    assert(empty == 0L)
    val allNull = Seq[Option[Long]](None, None).toDF("h")
      .agg(call_function("simhash_agg", col("h"))).as[Long].head()
    assert(allNull == 0L)
  }

  test("stays inside whole-stage codegen") {
    // a literal input would constant-fold to a LocalTableScan; range() forces
    // a real generated projection
    val plan = spark.range(5)
      .select(call_function("word_shingles",
        concat(lit("a b c "), col("id").cast("string")), lit(2)))
      .queryExecution.executedPlan.toString
    // the *(n) prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [word_shingles"), plan)
  }
}
