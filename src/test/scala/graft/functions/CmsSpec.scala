package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CmsSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(df: org.apache.spark.sql.DataFrame, depth: Int,
      width: Int) =
    df.agg(call_function("cms_sketch", col("v"), lit(depth), lit(width))
      .as("sk"))

  test("cms: estimates never underestimate; exact at ample width") {
    val vals = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val df = vals.toDF("v")
    val sk = sketch(df, 4, 1024)
    val est = df.distinct()
      .crossJoin(sk)
      .select(col("v"), call_function("cms_estimate", col("sk"), col("v"),
        lit(4), lit(1024)).as("e"))
      .as[(String, Long)].collect().toMap
    // 3 distinct items in 4x1024 counters: collisions essentially
    // impossible, the estimate is exact
    assert(est == Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
  }

  test("cms: one-sided error under heavy collision pressure") {
    // 500 distinct items into width 16: collisions guaranteed, but the
    // estimate must never drop below the true count
    val df = (1 to 500).flatMap(i => Seq.fill(1 + i % 3)(s"item$i")).toDF("v")
    val sk = sketch(df, 4, 16)
    val got = df.groupBy("v").agg(count(lit(1)).as("exact"))
      .crossJoin(sk)
      .select(call_function("cms_estimate", col("sk"), col("v"),
        lit(4), lit(16)).as("e"), col("exact"))
      .as[(Long, Long)].collect()
    assert(got.nonEmpty && got.forall { case (e, exact) => e >= exact })
  }

  test("cms: sketch is bit-identical under repartitioning; nulls skipped") {
    val df = (1 to 300).map(i => s"k${i % 37}").toDF("v")
    val a = sketch(df, 3, 64).as[Seq[Long]].head()
    val b = sketch(df.repartition(13), 3, 64).as[Seq[Long]].head()
    assert(a == b)
    // counter sums equal depth * non-null row count
    assert(a.sum == 3L * 300)
    val withNulls = df.union(Seq.fill(5)(null.asInstanceOf[String]).toDF("v"))
    val c = sketch(withNulls, 3, 64).as[Seq[Long]].head()
    assert(c == a)
  }

  test("cms: analysis-time rejection of bad types and parameters") {
    val df = Seq(1L, 2L).toDF("v")
    intercept[Exception] { sketch(df, 4, 1024).collect() }
    intercept[Exception] {
      Seq("x").toDF("v").agg(call_function("cms_sketch", col("v"),
        lit(0), lit(1024))).collect()
    }
    // individually-legal depth × width whose product can't serialize
    // (16 × 2^24 counters would overflow the Int buffer size) must be
    // rejected at ANALYSIS time, not crash at shuffle time
    intercept[Exception] {
      Seq("x").toDF("v").agg(call_function("cms_sketch", col("v"),
        lit(16), lit(1 << 24))).collect()
    }
  }
}
