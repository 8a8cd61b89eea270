package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) statistics — the outlier screen that survives
  * the outliers themselves: q114's mean/σ z-score moves with every anomaly
  * it is trying to flag, while the median and the median-absolute-deviation
  * (MAD, consistency-scaled by 1.4826 toward σ under normality) have a 50%
  * breakdown point (Hampel 1974; Leys et al. 2013's |x−med| > 3·1.4826·MAD
  * rule).
  *
  * Exact per-group medians WITHOUT a per-group global sort: the
  * distributed-rank device of [[FeatureEncoding.quantileBins]], grouped —
  * range-partition by (group, value, id), rank locally per partition, and
  * re-base each partition's ranks with broadcast per-(group, partition)
  * offset sums. A hot group spans many partitions instead of sorting on
  * one reducer — the shape that survives 7 groups × 100 TB. The lower
  * median (position ⌈n/2⌉, an actual data value — DuckDB `quantile_disc`
  * convention) avoids interpolation entirely: every output is a data value
  * or one IEEE op on data values, deterministic on any partitioning.
  */
object Robust {

  /** Per-group exact ranks of `vCol` (ties broken by `idCol`): emits the
    * input columns plus `__rank` (1-based within group) via local ranks +
    * broadcast offsets — no single-partition-per-group window. */
  private def groupRanked(df: DataFrame, gCol: String, vCol: String,
      idCol: String): DataFrame = {
    val ranged = df
      .repartitionByRange(col(gCol), col(vCol), col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // pin partition ids across the two consumers
    val localW = Window.partitionBy("__pid", gCol).orderBy(vCol, idCol)
    val offsets = ranged.groupBy(col("__pid"), col(gCol))
      .agg(count(lit(1)).as("__pn"))
      .withColumn("__offset",
        coalesce(sum("__pn").over(
          Window.partitionBy(gCol).orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col(gCol), col("__offset"))
    ranged
      .withColumn("__lr", row_number().over(localW).cast("long"))
      .join(broadcast(offsets), Seq("__pid", gCol))
      .withColumn("__rank", col("__offset") + col("__lr"))
      .drop("__pid", "__lr", "__offset")
  }

  /** Per-group lower median (the ⌈n/2⌉-th smallest — an actual data
    * value): one grouped rank pass + the group-size aggregate. */
  private def groupMedian(df: DataFrame, gCol: String, vCol: String,
      idCol: String, out: String): DataFrame = {
    val sizes = df.groupBy(col(gCol)).agg(count(lit(1)).as("__n"))
    groupRanked(df, gCol, vCol, idCol)
      .join(broadcast(sizes), Seq(gCol))
      .filter(col("__rank") === expr("(__n + 1) div 2"))
      .select(col(gCol), col(vCol).as(out), col("__n").as(s"__n_$out"))
  }

  /** Per-row percent rank within its group — rank-based feature scaling
    * (the normalization that survives arbitrary score distributions;
    * SQL `PERCENT_RANK` semantics: `(rank−1)/(n−1)`, 0 for singleton
    * groups, ties broken by `idCol` so the rank is total). One grouped
    * rank pass + a broadcast size join; the division is the single IEEE
    * op, identical in any engine. */
  def percentRank(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(valueCol), col(idCol))
      .filter(col(valueCol).isNotNull)
    val sizes = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    groupRanked(base, groupCol, valueCol, idCol)
      .join(broadcast(sizes), Seq(groupCol))
      .select(col(groupCol), col(idCol), col(valueCol),
        when(col("__n") === 1L, lit(0.0))
          .otherwise((col("__rank") - lit(1L)).cast("double") /
            (col("__n") - lit(1L)).cast("double")).as("pct"))
  }

  /** Per-group trimmed mean: drop the lowest and highest
    * `trimPermille`/1000 of rows by exact rank (integer arithmetic — no
    * float cut index) and average the kept values on the fixed
    * `scale`-quantization grid (exact long sums, the q70 device — the
    * one IEEE division happens once per group). The robust location
    * estimate between the mean (trim 0) and the median (trim 500). */
  def trimmedMean(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, trimPermille: Int = 100,
      scale: Int = 10000): DataFrame = {
    require(trimPermille >= 0 && trimPermille < 500, "trim must be in [0, 500)")
    val base = df.select(col(groupCol), col(valueCol), col(idCol))
      .filter(col(valueCol).isNotNull)
    val sizes = base.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    groupRanked(base, groupCol, valueCol, idCol)
      .join(broadcast(sizes), Seq(groupCol))
      .withColumn("__k", expr(s"(__n * $trimPermille) div 1000"))
      .filter(col("__rank") > col("__k") &&
        col("__rank") <= col("__n") - col("__k"))
      .groupBy(col(groupCol))
      .agg(
        min(col("__n")).as("n"), // constant within group
        count(lit(1)).as("n_kept"),
        sum(round(col(valueCol) * scale).cast("long")).as("__qs"))
      .withColumn("trimmed_mean",
        col("__qs").cast("double") /
          (col("n_kept").cast("double") * lit(scale.toDouble)))
      .drop("__qs")
  }

  /** Per group: n, median, MAD, and the count of |x − median| >
    * `cut`·1.4826·MAD outliers. Two grouped rank passes (median, then
    * median of deviations) + one counting aggregate; medians/MADs ride
    * broadcast joins back to the rows. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
      idCol: String, cut: Double = 3.0): DataFrame = {
    val base = df.select(col(groupCol), col(valueCol), col(idCol))
      .filter(col(valueCol).isNotNull)
    val med = groupMedian(base, groupCol, valueCol, idCol, "median")
    val dev = base.join(broadcast(med), Seq(groupCol))
      .withColumn("__dev", abs(col(valueCol) - col("median")))
    val mad = groupMedian(dev.select(col(groupCol), col("__dev"), col(idCol)),
      groupCol, "__dev", idCol, "mad")
    dev.join(broadcast(mad.select(col(groupCol), col("mad"))), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        min(col("median")).as("median"), // constant within group
        min(col("mad")).as("mad"),
        sum(when(col("__dev") > lit(cut * 1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
