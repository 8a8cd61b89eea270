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
  * Scale shape: the pair generation self-joins the DISTINCT (basket, item)
  * relation on the basket key — fan-out per basket is |basket|²/2, which is
  * bounded by the natural basket size (an order has ≤ O(10) lines), NOT by
  * the corpus, so the join is a plain keyed shuffle with no wedge
  * explosion. (For unbounded baskets, cap per-basket items first — same
  * guard as [[graft.graph.LinkPrediction]]'s hubCap.) Counts are exact
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
    val pairs = items.as("i1")
      .join(items.as("i2"),
        col("i1.ok") === col("i2.ok") && col("i1.pk") < col("i2.pk"))
      .groupBy(col("i1.pk").as("p1"), col("i2.pk").as("p2"))
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
}
