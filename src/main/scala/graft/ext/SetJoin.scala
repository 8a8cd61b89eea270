package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact Jaccard set-similarity self-join with PREFIX FILTERING (the
  * SSJoin/PPJoin family — Chaudhuri et al. 2006, Xiao et al. 2008): two
  * sets with `J ≥ t` must share at least one token in their rare-first
  * prefixes of length `|A| − ⌈t·|A|⌉ + 1` under any fixed global token
  * order, so candidates come from an inverted index over PREFIX tokens
  * only — the index shrinks by the factor `t` and, because prefixes are
  * rare-first, the hottest tokens never enter it. The filter is LOSSLESS:
  * the oracle recomputes the join from the FULL inverted index and the
  * result sets must hash-match exactly (a per-round proof of the prefix
  * bound, not just a spot check).
  *
  * This is the itemset twin of [[TextDedup.jaccardPairs]] (shingles →
  * items): near-identical customer baskets, co-purchase templates,
  * duplicate orders.
  *
  * Scale shape: one frequency aggregate, one per-set window bounded by
  * set size (rank items rare-first), an equi-join on prefix tokens, then
  * exact verification by counting shared items per candidate pair —
  * every join keyed, no cross product, candidate volume bounded by
  * Σ_token df(token-in-prefix)². All arithmetic exact integers until the
  * final Jaccard ratio. */
object SetJoin {

  def jaccardPairs(df: DataFrame, idCol: String, itemCol: String,
      minJaccard: Double): DataFrame = {
    require(minJaccard > 0.0 && minJaccard <= 1.0,
      "minJaccard must be in (0, 1]")
    val items = df.select(col(idCol).as("id"), col(itemCol).as("item"))
      .distinct()
    val size = items.groupBy("id").agg(count(lit(1)).as("sz"))
    val freq = items.groupBy("item").agg(count(lit(1)).as("f"))
    val prefix = items
      .join(freq, "item")
      .join(size, "id")
      .withColumn("__r", row_number().over(
        Window.partitionBy("id").orderBy(col("f"), col("item"))))
      .where(col("__r") <=
        col("sz") - ceil(lit(minJaccard) * col("sz")).cast("long") + 1)
      .select(col("id"), col("item"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.item") === col("b.item") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_l"), col("b.id").as("id_r")).distinct()
    val inter = cand
      .join(items.select(col("id").as("id_l"), col("item")), "id_l")
      .join(items.select(col("id").as("id_r"), col("item")), Seq("id_r", "item"))
      .groupBy("id_l", "id_r").agg(count(lit(1)).as("common"))
    inter
      .join(size.select(col("id").as("id_l"), col("sz").as("sz_l")), "id_l")
      .join(size.select(col("id").as("id_r"), col("sz").as("sz_r")), "id_r")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("sz_l") + col("sz_r") - col("common")))
      .where(col("jaccard") >= minJaccard)
      .select(col("id_l"), col("id_r"), col("common").cast("long").as("common"),
        col("sz_l").cast("long").as("sz_l"), col("sz_r").cast("long").as("sz_r"),
        col("jaccard"))
  }
}
