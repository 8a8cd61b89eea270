package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parallel personalized PageRank (the GraphFrames
  * `parallelPersonalizedPageRank` surface; beyond-reference like
  * shortestPaths/SCC): PageRank where teleportation returns to ONE source
  * vertex, computed for many sources at once.
  *
  * Output is the sparse relational form `(id, source, rank)` — one row per
  * (vertex, source) pair with non-zero rank — instead of GraphFrames'
  * per-vertex rank *vector* column: sparse rows shuffle and prune like any
  * other table, while a dense vector column forces every vertex row to
  * carry |sources| doubles.
  *
  * Iteration: rank = resetProb·δ(v = source) + (1−resetProb)·Σ incoming
  * rank/outDegree (the GraphX formulation; dangling mass is not
  * redistributed). Each round is one join of the sparse rank table against
  * the out-degree-annotated edges plus a hash aggregate on (dst, source) —
  * work scales with non-zero entries, not |V|×|sources|. */
object PersonalizedPageRank {

  def run(g: PropertyGraph, sources: Seq[Long], maxIter: Int,
      resetProb: Double = 0.15, checkpointDir: Option[String] = None): DataFrame = {
    require(sources.nonEmpty, "need at least one source vertex")
    val spark = g.vertices.sparkSession
    val ckpt = Checkpointer(spark, checkpointDir)
    import spark.implicits._

    val outDeg = g.edges.groupBy(col("src")).agg(count(lit(1)).as("__deg"))
    // lazy checkpoints: fixed-round loop, no per-round action — see Pregel
    val e = ckpt.lazily(g.edges.select(col("src"), col("dst")).join(outDeg, "src"))
    val reset = sources.toDF("source")
      .select(col("source").as("id"), col("source"), lit(resetProb).as("__r"))

    var ranks = ckpt.lazily(sources.toDF("source")
      .select(col("source").as("id"), col("source"), lit(1.0).as("rank")))
    for (_ <- 1 to maxIter) {
      val contrib = ranks
        .join(e, ranks("id") === e("src"))
        .select(col("dst").as("id"), col("source"),
          (col("rank") / col("__deg")).as("__c"))
        .groupBy("id", "source")
        .agg((lit(1.0 - resetProb) * sum(col("__c"))).as("__damped"))
      ranks = ckpt.lazyFresh(contrib
        .join(reset, Seq("id", "source"), "full_outer")
        .select(col("id"), col("source"),
          (coalesce(col("__damped"), lit(0.0)) + coalesce(col("__r"), lit(0.0)))
            .as("rank")))
    }
    ranks
  }
}
