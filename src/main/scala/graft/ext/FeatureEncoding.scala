package graft.ext

import org.apache.spark.sql.DataFrame
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
}
