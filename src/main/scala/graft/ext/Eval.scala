package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus- and model-evaluation diagnostics for training-data pipelines —
  * the measurement layer that decides whether a filter/dedup/index stage
  * actually helped. The reference evaluates its ER model by inspecting
  * scored comparisons (`/root/reference/03_aml_entity_resolution.py:94`,
  * driver-side pandas); these are the distributed equivalents.
  *
  * Everything is exact integer/count arithmetic until a final division, so
  * results are partitioning-independent and cross-engine mirrorable.
  */
object Eval {

  /** Exact ROC-AUC (Mann–Whitney with midrank tie correction) of a score
    * column against a boolean label, computed distributed:
    *
    *   AUC · 2PN = Σ_s pos_s · (2 · negBelow_s + neg_s)
    *
    * over DISTINCT score values s — each positive beats every lower-scored
    * negative (1 pair) and half-beats every tied negative (midrank ½).
    *
    * 100 TB shape: one keyed groupBy collapses N rows to S distinct scores,
    * then the exclusive running negative count is a DISTRIBUTED prefix sum —
    * range-repartition by score, per-range local window, plus broadcast
    * per-range offsets (the only global window is over the per-partition
    * totals, bounded by the shuffle-partition count, never by data). No
    * global rank over N rows anywhere.
    *
    * Output: one row (pos_total, neg_total, auc). All sums are exact
    * integers; the single double division at the end is reproduced
    * bit-for-bit by the SQL oracle.
    */
  def auc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val perScore = df
      .groupBy(score.as("score"))
      .agg(
        sum(when(label, 1L).otherwise(0L)).as("pos"),
        sum(when(label, 0L).otherwise(1L)).as("neg"))
    // distributed exclusive prefix sum of `neg` in score order
    val ranged = perScore
      .repartitionByRange(col("score"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint() // read twice (local sums + offsets); pin the pid
    val localW = Window.partitionBy("__pid").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = ranged.withColumn("__below_local",
      coalesce(sum("neg").over(localW), lit(0L)))
    // per-range totals: numShufflePartitions rows — bounded by config, not
    // data, so the single-partition window over them is safe at any scale
    val offsets = ranged.groupBy("__pid").agg(sum("neg").as("__ptot"))
      .withColumn("__offset",
        coalesce(sum("__ptot").over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__offset")
    val scored = withLocal
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("neg_below", col("__below_local") + col("__offset"))
    scored
      .agg(
        sum("pos").as("pos_total"),
        sum("neg").as("neg_total"),
        sum(col("pos") * (col("neg_below") * 2 + col("neg"))).as("__num2"))
      .select(
        col("pos_total"), col("neg_total"),
        when(col("pos_total") > 0 && col("neg_total") > 0,
          col("__num2").cast("double") /
            (col("pos_total").cast("double") * col("neg_total") * lit(2.0)))
          .as("auc"))
  }

  /** Calibration bins (reliability-diagram data) for a score against a
    * boolean label: equi-width bins over [lo, hi), out-of-range scores
    * clamped into the edge bins. Per bin: row count, positive count,
    * positive fraction, and mean score. One keyed aggregate — the
    * companion diagnostic to [[auc]] (discrimination) measuring
    * calibration.
    *
    * Determinism: the bin index is scalar per-row arithmetic; the
    * aggregates are exact integer counts/sums (callers pass an integral
    * score column — a double-summed score would be shuffle-order
    * dependent), so the two final divisions are reproduced bit-for-bit by
    * the SQL oracle. */
  def calibrationBins(df: DataFrame, score: Column, label: Column,
      lo: Long, hi: Long, bins: Int): DataFrame = {
    require(bins > 0 && hi > lo, "need bins > 0 and hi > lo")
    val width = (hi - lo).toDouble / bins
    val bin = least(greatest(
      floor((score.cast("double") - lo) / width).cast("long"), lit(0L)),
      lit(bins - 1L))
    df.groupBy(bin.as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(label, 1L).otherwise(0L)).as("pos"),
        sum(score.cast("long")).as("__score_sum"))
      .select(col("bin"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n")).as("frac_pos"),
        (col("__score_sum").cast("double") / col("n")).as("mean_score"))
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * standard ANN quality gate. Both inputs are (queryCol, idCol, rankCol)
    * shaped (what [[Similarity.lshTopK]] / [[Similarity.bruteForceTopK]] /
    * [[Ivf.topK]] emit); rows ranked > k are ignored so callers can pass
    * deeper result sets unchanged.
    *
    * 100 TB shape: a single equi-join on (query, neighbor) between two
    * already-tiny top-k tables (Q·k rows each) — the expensive part is the
    * ANN runs themselves, not this. Queries with zero approximate hits
    * still appear (left join), with recall 0.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, queryCol: String,
      idCol: String, k: Int, rankCol: String = "rank"): DataFrame = {
    val ex = exact.filter(col(rankCol) <= k)
      .select(col(queryCol).as("query_id"), col(idCol).as("neighbor_id"))
    val ap = approx.filter(col(rankCol) <= k)
      .select(col(queryCol).as("query_id"), col(idCol).as("neighbor_id"),
        lit(1L).as("__hit"))
    ex.join(ap, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("exact_k"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .select(col("query_id"), col("exact_k"), col("hits"),
        (col("hits").cast("double") / col("exact_k")).as("recall"))
  }

  /** Pairwise cross-source n-gram overlap — the corpus-contamination matrix
    * ("how much of source A's content also appears in source B"). For every
    * unordered source pair: the count of shared distinct word n-gram
    * shingles and the Jaccard over the sources' shingle sets.
    *
    * 100 TB shape: documents collapse to a DISTINCT (source, shingle)
    * index first — per-shingle join fan-out is bounded by the number of
    * sources (a handful), never by document count, so a boilerplate shingle
    * shared by 10⁶ documents contributes one row per source. Output is at
    * most |sources|² rows.
    */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String,
      n: Int): DataFrame = {
    val sh = df
      .select(col(srcCol).as("source"),
        explode(call_function("word_shingles", col(textCol), lit(n))).as("sh"))
      .distinct()
      .localCheckpoint() // read three times: sizes + both join sides
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("sz"))
    val inter = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_l"), col("b.source").as("source_r"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(broadcast(sizes.withColumnRenamed("source", "source_l")
        .withColumnRenamed("sz", "sz_l")), Seq("source_l"))
      .join(broadcast(sizes.withColumnRenamed("source", "source_r")
        .withColumnRenamed("sz", "sz_r")), Seq("source_r"))
      .select(col("source_l"), col("source_r"), col("common"),
        col("sz_l"), col("sz_r"),
        (col("common").cast("double") /
          (col("sz_l") + col("sz_r") - col("common"))).as("jaccard"))
  }
}
