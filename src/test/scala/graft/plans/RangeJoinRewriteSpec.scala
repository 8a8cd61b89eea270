package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class RangeJoinRewriteSpec extends SparkTestBase {
  import spark.implicits._

  private val WidthKey = "spark.graft.rangeJoin.bucketWidth"

  private def points = (0L until 500L).map(i => (i, i * 7 % 1000)).toDF("pid", "p")
  private def intervals = (0L until 80L)
    .map(i => (i, i * 11 % 900, i * 11 % 900 + i % 50)).toDF("iid", "lo", "hi")

  private def naiveJoin = points.join(intervals,
    col("p") >= col("lo") && col("p") <= col("hi"))

  private def withWidth[T](w: String)(body: => T): T =
    try { spark.conf.set(WidthKey, w); body }
    finally spark.conf.unset(WidthKey)

  test("rewrites a bare range join to a bucketed hash join with identical results") {
    val expected = naiveJoin.as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(expected.nonEmpty)
    withWidth("64") {
      val df = naiveJoin
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"still BNLJ:\n$plan")
      assert(df.columns.toSeq == Seq("pid", "p", "iid", "lo", "hi")) // schema preserved
      assert(df.as[(Long, Long, Long, Long, Long)].collect().toSet == expected)
    }
  }

  test("the flipped orientation (intervals on the left) also rewrites") {
    val expected = intervals.join(points,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    withWidth("32") {
      val df = intervals.join(points,
        col("lo") <= col("p") && col("hi") >= col("p"))
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(df.as[(Long, Long, Long, Long, Long)].collect().toSet == expected)
    }
  }

  test("inert without the conf, and joins with extra cross-side conjuncts are untouched") {
    // no conf: the nested loop join stays
    assert(naiveJoin.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
    def keyed = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi") &&
        col("pid") % 4 === col("iid") % 4)
    val expected = keyed.as[(Long, Long, Long, Long, Long)].collect().toSet
    withWidth("64") {
      // an extra cross-side equi conjunct -> already a hash join; the rule
      // must leave it alone (3 cross-side conjuncts) and results must hold
      val plan = keyed.queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_pb"), s"rule touched an ineligible join:\n$plan")
      assert(keyed.as[(Long, Long, Long, Long, Long)].collect().toSet == expected)
    }
  }

  test("empty and degenerate intervals produce no phantom matches") {
    withWidth("16") {
      val inverted = Seq((1L, 50L, 10L)).toDF("iid", "lo", "hi") // lo > hi
      val out = points.join(inverted, col("p") >= col("lo") && col("p") <= col("hi"))
      assert(out.count() == 0)
      val single = Seq((1L, 42L, 42L)).toDF("iid", "lo", "hi")
      val hits = points.join(single, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("p").as[Long].collect()
      assert(hits.nonEmpty && hits.forall(_ == 42L))
    }
  }
}
