package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Categorical feature encoding for model training — the supervised
  * complement to [[Sampling]]'s splits and [[TextAnalysis]]'s quality
  * features: turn a high-cardinality categorical column into a numeric
  * one using the training target itself.
  *
  * Scale shape: one keyed aggregate over the category column plus one
  * broadcast single-row global aggregate — nothing corpus-sized survives
  * the first shuffle, and the encoder table (one row per category) is
  * itself broadcast-joinable back onto any frame.
  */
object FeatureEncoding {

  /** Smoothed mean target encoding (the m-estimate / CatBoost-prior form,
    * Micci-Barreca 2001): `enc(c) = (Σ_c y + m·prior) / (n_c + m)` with
    * `prior` the global target mean — categories with few rows shrink
    * toward the prior instead of memorizing noise. Counts and sums are
    * exact integers (the target is integral); `prior` and `enc` are the
    * only double ops, evaluated in one fixed shape so results are
    * bit-identical on any engine/partitioning. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      m: Double = 10.0): DataFrame = {
    val perCat = df.groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col(targetCol)).as("sum_y"))
    val global = df.agg(count(lit(1)).as("n_all"),
      sum(col(targetCol)).as("sum_all"))
    perCat.crossJoin(broadcast(global))
      .select(col(catCol), col("n").cast("long").as("n"),
        col("sum_y").cast("long").as("sum_y"),
        ((col("sum_y") + lit(m) * (col("sum_all") / col("n_all"))) /
          (col("n") + lit(m))).as("enc"))
  }

  /** Equal-frequency (quantile) discretizer with exact SQL `NTILE`
    * semantics: every row gets a bucket in `[1, k]`, the first `n mod k`
    * buckets hold `⌈n/k⌉` rows, the rest `⌊n/k⌋`, over the total order
    * `(value, id)` (the unique id breaks ties, so the binning is
    * deterministic — no arbitrary tie split).
    *
    * 100 TB shape: NOT a global single-partition `ntile` window. The rank
    * is a distributed prefix sum in the [[Eval.auc]] style — range-
    * repartition on the sort key, per-range `row_number`, plus broadcast
    * per-range row-count offsets (the only global window runs over the
    * per-partition totals, bounded by the shuffle-partition count, never
    * by data). The bucket is then pure per-row long arithmetic from
    * `(rank, n, k)` — bit-identical to `NTILE(k) OVER (ORDER BY v, id)`
    * on any engine. The `localCheckpoint` pins partition ids between the
    * two reads of the ranged frame; it is one executor-local
    * materialization of the projected (id, value) pair, the same cost
    * class as the shuffle that precedes it. */
  def quantileBins(df: DataFrame, valueCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, "need k >= 1 buckets")
    val base = df.select(col(valueCol).as("v"), col(idCol).as("id"))
    val ranged = base.repartitionByRange(col("v"), col("id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val localW = Window.partitionBy("__pid").orderBy("v", "id")
    val withLocal = ranged.withColumn("__lr",
      row_number().over(localW).cast("long"))
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__pn"))
      .withColumn("__offset",
        coalesce(sum("__pn").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    val total = base.agg(count(lit(1)).as("__n"))
    val ranked = withLocal
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("__rank", col("__offset") + col("__lr"))
      .crossJoin(broadcast(total))
    // NTILE arithmetic: q = ⌊n/k⌋, r = n mod k; the first r buckets have
    // q+1 rows. Integer ceil-divisions only — exact longs throughout.
    val q = expr(s"__n div $k")
    val r = col("__n") % lit(k.toLong)
    val bucket = when(col("__rank") <= r * (q + lit(1L)),
        expr(s"(__rank + (__n div $k)) div ((__n div $k) + 1)"))
      .otherwise(r +
        expr(s"(__rank - (__n % $k) * ((__n div $k) + 1) + (__n div $k) - 1)" +
          s" div (__n div $k)"))
    ranked.select(col("id"), col("v"), bucket.cast("int").as("bin"))
  }
}
