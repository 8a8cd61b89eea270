package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase

class IncrementalCCSpec extends SparkTestBase {
  import spark.implicits._

  private def assignOf(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id").cast("long"), col("component").cast("long"))
      .as[(Long, Long)].collect().toSet

  private def fullCC(edges: DataFrame): Set[(Long, Long)] =
    assignOf(ConnectedComponents.runOnEdges(edges))

  test("folding batches equals one batch CC over the union") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    // three interleaved batches so later batches both add new nodes and
    // merge components formed earlier
    val batches = (0 until 3).map(i => df.where(pmod(col("src"), lit(3)) === i))
    val inc = IncrementalCC.runBatches(batches)
    assert(assignOf(inc) == fullCC(df))
  }

  test("a single batch matches runOnEdges directly") {
    val df = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    assert(assignOf(IncrementalCC.runBatches(Seq(df))) == fullCC(df))
  }

  test("a later batch merging two components remaps all members to the global min") {
    val b1 = Seq((1L, 2L), (10L, 11L)).toDF("src", "dst")
    val b2 = Seq((2L, 10L)).toDF("src", "dst") // bridges the two components
    val got = assignOf(IncrementalCC.runBatches(Seq(b1, b2)))
    assert(got == Set((1L, 1L), (2L, 1L), (10L, 1L), (11L, 1L)))
  }

  test("duplicate and already-contracted edges in later batches are no-ops") {
    val b1 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val b2 = Seq((1L, 2L), (3L, 1L), (2L, 2L)).toDF("src", "dst")
    val got = assignOf(IncrementalCC.runBatches(Seq(b1, b2)))
    assert(got == Set((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("batches only ever touching disjoint nodes keep components independent") {
    val b1 = Seq((1L, 2L)).toDF("src", "dst")
    val b2 = Seq((20L, 21L), (21L, 22L)).toDF("src", "dst")
    val got = assignOf(IncrementalCC.runBatches(Seq(b1, b2)))
    assert(got == Set((1L, 1L), (2L, 1L), (20L, 20L), (21L, 20L), (22L, 20L)))
  }
}
