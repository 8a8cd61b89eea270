package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Approximate-aggregate (sketch) surface: HLL++ distinct counts and
  * t-digest-style percentile approximations, validated against the exact
  * aggregates on real testdata. Sketches are engine-internal (not
  * DuckDB-hashable), so the bound checks live here rather than in the
  * oracle gate. */
class SketchSpec extends SparkTestBase {

  private def li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")

  test("approx_count_distinct within configured relative error") {
    val row = li.agg(
      countDistinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0).toDouble, row.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.06,
      s"HLL estimate $approx too far from exact $exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val row = li.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val exact = row.getDouble(0)
    val approx = row.getDouble(1)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median $approx too far from exact $exact")
  }
}
