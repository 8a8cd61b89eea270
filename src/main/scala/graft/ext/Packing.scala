package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Token-budget sequence packing: assign documents to fixed-budget "packs"
  * (pre-tokenization context windows) by contiguous accumulation — the
  * concat-and-chunk packing step an LLM training pipeline runs before
  * example serialization.
  *
  * Scale shape: packing is computed *within deterministic shards*
  * (`id mod nShards`), so the running sum is a window partitioned by shard —
  * shard-parallel across the cluster, never the single global-partition
  * window that would serialize 100 TB through one task. Pack ids are unique
  * across shards, document order within a shard is the stable id order, and
  * the result is reproducible at any parallelism.
  */
object Packing {

  /** Max packs representable per shard in the composite pack id. */
  private val PacksPerShard = 1000000000L

  /** Append documents (ordered by `idCol` within each of `nShards` shards)
    * to the current pack until the token budget is crossed; the crossing
    * document stays in the pack it crossed (packs overflow by at most one
    * document, the standard greedy-contiguous trade — no document is ever
    * split). Output adds `shard`, `tokens`, `cum_tokens` (running total
    * within the shard) and the cross-shard-unique `pack_id`. */
  def packByBudget(df: DataFrame, idCol: String, tokens: Column,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, "budget and nShards must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("shard").orderBy(idCol)
    df.withColumn("shard", pmod(col(idCol), lit(nShards.toLong)))
      .withColumn("tokens", tokens)
      .withColumn("cum_tokens", sum(col("tokens")).over(w))
      // pack index = budget-quotient of the tokens BEFORE this document, so
      // a document lands in the pack that was open when it arrived
      .withColumn("pack_id",
        col("shard") * lit(PacksPerShard) +
          floor((col("cum_tokens") - col("tokens")) / lit(budget)).cast("long"))
  }

  /** Per-pack summary (size, token total, id range) of [[packByBudget]]. */
  def packSummary(packed: DataFrame, idCol: String): DataFrame =
    packed.groupBy(col("shard"), col("pack_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("tokens")).as("total_tokens"),
        min(col(idCol)).as("first_id"),
        max(col(idCol)).as("last_id"))
}
