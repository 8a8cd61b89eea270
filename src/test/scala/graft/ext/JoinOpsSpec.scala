package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  // quotes (right) and trades (left) keyed by symbol, long times
  private lazy val trades = Seq(
    ("A", 10L, 1), ("A", 25L, 2), ("A", 5L, 3),
    ("B", 10L, 4), ("C", 10L, 5)
  ).toDF("sym", "t", "trade_id")
  private lazy val quotes = Seq(
    ("A", 5L, 100.0), ("A", 20L, 101.0), ("A", 30L, 102.0),
    ("B", 11L, 200.0)
  ).toDF("sym", "t", "px")

  test("backward as-of picks the latest quote at-or-before each trade") {
    val got = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t")
      .select("trade_id", "r_t", "r_px")
      .as[(Int, Option[Long], Option[Double])].collect()
      .map { case (k, rt, px) => k -> (rt, px) }.toMap
    assert(got(1) == (Some(5L), Some(100.0)))   // 10 -> quote@5
    assert(got(2) == (Some(20L), Some(101.0)))  // 25 -> quote@20
    assert(got(3) == (Some(5L), Some(100.0)))   // 5 -> exact match taken
    assert(got(4) == (None, None))              // B@10: quote@11 is later
    assert(got(5) == (None, None))              // C: no quotes at all
  }

  test("forward as-of picks the earliest quote at-or-after each trade") {
    val got = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", "t")
      .select("trade_id", "r_t").as[(Int, Option[Long])].collect().toMap
    assert(got(1) == Some(20L))
    assert(got(2) == Some(30L))
    assert(got(3) == Some(5L)) // exact match taken
    assert(got(4) == Some(11L))
    assert(got(5) == None)
  }

  test("as-of matches the naive per-row argmax formulation on random data") {
    val n = 400
    val left = spark.range(n).select(
      (col("id") % 7).as("k"), pmod(col("id") * 2654435761L, lit(1000L)).as("t"),
      col("id").as("lid"))
    val right = spark.range(n).select(
      (col("id") % 7).as("k"), pmod(col("id") * 40503L + 17L, lit(1000L)).as("t"),
      col("id").as("rid"))
    val deduped = AsOfJoin.dedupeRight(right, Seq("k"), "t")
    val fast = AsOfJoin.backward(left, deduped, Seq("k"), "t", "t")
      .select(col("lid"), coalesce(col("r_rid"), lit(-1L)).as("m"))
    // naive: theta join + argmax (the quadratic plan the operator avoids)
    val naive = left.as("l")
      .join(deduped.as("r"), col("l.k") === col("r.k") && col("l.t") >= col("r.t"), "left")
      .groupBy(col("lid"))
      .agg(coalesce(max_by(col("r.rid"), struct(col("r.t"))), lit(-1L)).as("m"))
    assert(fast.orderBy("lid").collect().toSeq ==
      naive.orderBy("lid").collect().toSeq)
    assert(fast.count() == n) // exactly one output row per left row
  }

  test("the plan is one shuffle on the key — no nested-loop join") {
    val plan = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("point-in-interval matches the naive theta join at every bucket width") {
    val points = spark.range(300).select(
      pmod(col("id") * 2654435761L, lit(500L)).as("v"), col("id").as("pid"))
    val intervals = spark.range(60).select(
      pmod(col("id") * 40503L, lit(450L)).as("lo"), col("id").as("iid"))
      .withColumn("hi", col("lo") + pmod(col("iid") * 7L, lit(80L)))
    val naive = points.join(intervals,
        col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    for (w <- Seq(1L, 10L, 64L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"width $w emitted duplicates")
      assert(got.toSet == naive, s"width $w mismatch")
    }
  }

  test("interval overlap finds every intersecting pair exactly once") {
    val a = Seq((0L, 10L, 1L), (20L, 30L, 2L), (5L, 25L, 3L))
      .toDF("a_lo", "a_hi", "a_id")
    val b = Seq((10L, 12L, 10L), (26L, 40L, 20L), (50L, 60L, 30L))
      .toDF("b_lo", "b_hi", "b_id")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi", 8L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // a3=[5,25] vs b20=[26,40] do NOT touch; b10 starting inside a3
    // exercises the flipped (startsBefore) orientation
    assert(got.sorted == Seq((1L, 10L), (2L, 20L), (3L, 10L)))
  }

  test("negative values bucket correctly (true floor division)") {
    val points = Seq((-15L, 1L), (-5L, 2L), (0L, 3L)).toDF("v", "pid")
    val intervals = Seq((-20L, -10L, 1L), (-6L, 2L, 2L)).toDF("lo", "hi", "iid")
    val got = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 2L)))
  }

  test("the plan is an equi join on the bucket — no nested loop") {
    val points = spark.range(10).select(col("id").as("v"), col("id").as("pid"))
    val intervals = spark.range(5).select(
      col("id").as("lo"), (col("id") + 3L).as("hi"), col("id").as("iid"))
    val plan = RangeJoin.pointInInterval(points, intervals, "v", "lo", "hi", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }
}

class BloomJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bloom semi-join equals the exact semi-join (false positives re-verified)") {
    val large = spark.range(5000).select(col("id"), (col("id") % 97L).as("payload"))
    val small = spark.range(200).select((col("id") * 31L).as("key"))
    val got = BloomJoin.semiJoin(large, "id", small, "key",
        expectedItems = 200, fpp = 0.2) // high fpp to force false positives
      .select("id").as[Long].collect().toSet
    val exact = large.join(small, col("id") === col("key"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(got == exact)
  }

  test("the probe alone prunes most non-members and never drops a member") {
    val keys = spark.range(100).select((col("id") * 13L).as("k"))
    val filter = BloomJoin.buildFilter(keys, "k", expectedItems = 100, fpp = 0.03)
    val probed = spark.range(10000)
      .where(BloomJoin.mightContain(col("id"), filter))
      .select("id").as[Long].collect().toSet
    val members = (0L until 100L).map(_ * 13L).toSet
    assert(members.subsetOf(probed), "bloom dropped a true member")
    assert(probed.size < 1500, s"bloom pruned too little: ${probed.size}")
  }

  test("null keys probe to null and are filtered, not crashed") {
    val keys = Seq(Some(1L), Some(2L)).toDF("k")
    val filter = BloomJoin.buildFilter(keys, "k", 10)
    val withNull = Seq(Some(1L), None, Some(99L)).toDF("k")
    val got = withNull.where(BloomJoin.mightContain(col("k"), filter))
      .select("k").as[Option[Long]].collect().toSet
    assert(got.contains(Some(1L)) && !got.contains(None))
  }

  test("probe expression stays inside whole-stage codegen") {
    val keys = spark.range(10).toDF("k")
    val filter = BloomJoin.buildFilter(keys, "k", 10)
    val plan = spark.range(100).where(BloomJoin.mightContain(col("id"), filter))
      .queryExecution.executedPlan.toString
    // `*(n)` marks operators fused into a WholeStageCodegen span
    assert(plan.contains("*(1) Filter bloomprobe"), plan)
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
