package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class VectorAggSpec extends SparkTestBase {
  import spark.implicits._

  private val rows = Seq(
    (1L, "a", Array(1.0f, 2.0f, 3.0f)),
    (2L, "a", Array(3.0f, 2.0f, 1.0f)),
    (3L, "b", Array(0.5f, -0.5f, 0.25f)))
  private def df = rows.toDF("id", "cluster", "vec")

  test("quantized centroids are the exact per-dimension means") {
    val out = VectorAgg.groupedCentroids(df, "cluster", "vec")
      .orderBy("cluster", "pos")
      .as[(String, Long, Long, Double)].collect()
    assert(out.toSeq == Seq(
      ("a", 0L, 2L, 2.0), ("a", 1L, 2L, 2.0), ("a", 2L, 2L, 2.0),
      ("b", 0L, 1L, 0.5), ("b", 1L, 1L, -0.5), ("b", 2L, 1L, 0.25)))
  }

  test("quantization floors at the requested granularity") {
    val fine = Seq(("x", Array(0.1234567f))).toDF("cluster", "vec")
    val got = VectorAgg.groupedCentroids(fine, "cluster", "vec", quantScale = 1000L)
      .select("centroid").as[Double].head()
    assert(got == 0.123)
  }

  test("raw-float mode (quantScale = 0) computes plain averages") {
    val out = VectorAgg.groupedCentroids(df, "cluster", "vec", quantScale = 0L)
      .orderBy("cluster", "pos")
      .as[(String, Long, Long, Double)].collect()
    assert(out.forall { case (_, _, _, c) => !c.isNaN })
    assert(math.abs(out.head._4 - 2.0) < 1e-6)
  }

  test("one shuffle: plan has a single aggregate exchange, no window") {
    val plan = VectorAgg.groupedCentroids(df, "cluster", "vec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    // partial + final hash aggregate around one shuffle
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1)
  }
}
