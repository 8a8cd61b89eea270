package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise co-occurrence mining (market-basket lift) over a
  * (basket, item) relation — the association-rule primitive behind both
  * retail affinity and AML peer-group detection (entities repeatedly
  * transacting into the same counterparties; the reference's network
  * notebook surfaces shared-counterparty structure as a graph, this is the
  * same signal as a ranked item-pair statistic).
  *
  * Scale shape: pair generation groups each basket's DISTINCT items into
  * one bounded array and double-explodes the pairs — fan-out per basket is
  * |basket|²/2, bounded by the natural basket size (an order has ≤ O(10)
  * lines), NOT by the corpus, so the whole step is one keyed aggregate
  * with no wedge explosion and no self-join upstream recompute. (For
  * unbounded baskets, cap per-basket items first — same guard as
  * [[graft.graph.LinkPrediction]]'s hubCap.) Counts are exact
  * BIGINTs; lift = (N · c_ab) / (c_a · c_b) is a ratio of exact integers
  * evaluated identically on every engine.
  */
object MarketBasket {

  /** @param baskets DataFrame with `basketCol` and `itemCol`.
    * @param minSupport emit only pairs co-occurring in at least this many
    *                   baskets. */
  def pairLift(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupport: Int = 2): DataFrame = {
    val items = baskets
      .select(col(basketCol).as("ok"), col(itemCol).as("pk")).distinct()
    val n = items.agg(countDistinct(col("ok")).as("n"))
    val pc = items.groupBy(col("pk")).agg(count(lit(1)).as("c"))
    // pair generation from ONE grouped copy of each basket (per-basket
    // item array, bounded by the natural basket size) instead of a
    // self-join on the basket key — the join plans the scan+distinct
    // upstream twice, the grouped double-explode once, at identical
    // pair volume (|basket|²/2 rows per basket either way)
    val pairs = items.groupBy("ok")
      .agg(collect_list(col("pk")).as("__ps"))
      .select(explode(col("__ps")).as("p1"), col("__ps"))
      .select(col("p1"), explode(col("__ps")).as("p2"))
      .where(col("p1") < col("p2"))
      .groupBy("p1", "p2")
      .agg(count(lit(1)).as("cab"))
      .where(col("cab") >= minSupport)
    pairs
      .join(pc.as("c1"), col("p1") === col("c1.pk"))
      .join(pc.as("c2"), col("p2") === col("c2.pk"))
      .crossJoin(broadcast(n))
      .select(col("p1"), col("p2"), col("cab").cast("long").as("cab"),
        col("c1.c").cast("long").as("c1"), col("c2.c").cast("long").as("c2"),
        round(col("cab") * col("n") / (col("c1.c") * col("c2.c")), 4)
          .as("lift"))
  }

  /** Item-item collaborative-filtering similarity (the Amazon/Sarwar 2001
    * item-based recommender table): each item as its basket-incidence
    * vector, pairwise cosine `c_ab / √(c_a·c_b)` from the SAME exact
    * integer supports as [[pairLift]], then the top `k` neighbors per item
    * (both directions of each pair, ranked by cosine with the neighbor id
    * as the total tie-break). Output is ≤ k rows per item — the bounded
    * recommendation table, not the full pair set. */
  def itemNeighbors(baskets: DataFrame, basketCol: String, itemCol: String,
      k: Int = 5, minSupport: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lazy checkpoint: the pair table feeds both orientations of the union
    val pl = graft.graph.Checkpointer(baskets.sparkSession, None)
      .lazily(pairLift(baskets, basketCol, itemCol, minSupport))
    val sym = pl
      .select(col("p1").as("item"), col("p2").as("neighbor"),
        col("cab"), col("c1").as("ci"), col("c2").as("cn"))
      .unionAll(pl
        .select(col("p2").as("item"), col("p1").as("neighbor"),
          col("cab"), col("c2").as("ci"), col("c1").as("cn")))
      .withColumn("cosine",
        col("cab") / (sqrt(col("ci").cast("double")) *
          sqrt(col("cn").cast("double"))))
    val w = Window.partitionBy("item")
      .orderBy(col("cosine").desc, col("neighbor"))
    sym.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("item"), col("neighbor"), col("cab"),
        round(col("cosine"), 4).as("cosine"), col("rank"))
  }
}
