package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed as-of (temporal) join — for every left row, the single right
  * row with the greatest right-time <= left-time (backward; `forward` flips
  * to the smallest right-time >= left-time) among rows sharing the join
  * keys. The pandas `merge_asof` / DuckDB `ASOF JOIN` surface, which Spark
  * has no native operator for.
  *
  * A naive formulation is a range theta-join (`l.t >= r.t`) followed by a
  * per-left-row argmax — a BroadcastNestedLoopJoin over |L|x|R| pairs, fatal
  * beyond toy scale. This implementation is the canonical shuffle-once
  * shape instead:
  *
  *   1. union the two sides, tagged, with each side's payload in a struct;
  *   2. one window per key ordered by (time, side) carrying the last
  *      non-null right payload forward (`last(..., ignoreNulls)` over
  *      UNBOUNDED PRECEDING .. CURRENT ROW — a single running pass, no
  *      re-sort per frame);
  *   3. keep only left rows; their carried struct IS the as-of match.
  *
  * Cost: ONE shuffle of |L|+|R| rows on the join keys plus an in-partition
  * sort — the same plan a sort-merge join would pay, with no pair blow-up.
  * At 100 TB the shuffle partitions by key hash exactly like any wide join;
  * a single pathologically hot key serializes into one partition's sort
  * (inherent to per-key total ordering — pre-aggregate such keys first).
  *
  * Tie semantics: right rows sort before left rows at equal time, so exact
  * timestamp matches are taken (DuckDB ASOF / merge_asof
  * `allow_exact_matches=True`). Multiple right rows at the SAME (keys, time)
  * are ambiguous — deduplicate the right side first (the operator does not
  * pick silently: `dedupeRight` aggregates deterministically when asked).
  */
object AsOfJoin {

  /** For each left row: the right row with max rightTime <= leftTime.
    * Right payload columns (all but the join keys) come back prefixed with
    * `rightPrefix`, null when no right row precedes the left row (left-join
    * semantics). */
  def backward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame =
    run(left, right, on, leftTime, rightTime, rightPrefix, fwd = false)

  /** For each left row: the right row with min rightTime >= leftTime. */
  def forward(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String,
      rightPrefix: String = "r_"): DataFrame =
    run(left, right, on, leftTime, rightTime, rightPrefix, fwd = true)

  /** Deterministic right-side dedupe for ambiguous (keys, time) ties: keeps
    * the max of every payload column per (keys, time) group. */
  def dedupeRight(right: DataFrame, on: Seq[String], rightTime: String): DataFrame = {
    val payload = right.columns.toSeq.filterNot(c => on.contains(c) || c == rightTime)
    if (payload.isEmpty) right.distinct()
    else right.groupBy((on :+ rightTime).map(col): _*)
      .agg(payload.head -> "max", payload.tail.map(_ -> "max"): _*)
      .select((on :+ rightTime).map(col) ++
        payload.map(c => col(s"max($c)").as(c)): _*)
  }

  private def run(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTime: String, rightTime: String, rightPrefix: String,
      fwd: Boolean): DataFrame = {
    require(on.nonEmpty, "as-of join requires at least one equi key")
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(on.contains)

    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct(rightPayload.map(right(_)): _*)
    val lType = StructType(leftCols.map(c => left.schema(c)))
    val rType = StructType(rightPayload.map(c => right.schema(c)))

    val lSide = left.select(
      on.map(col) ++ Seq(
        col(leftTime).as("__t"), lit(0).as("__side"),
        lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val rSide = right.select(
      on.map(col) ++ Seq(
        col(rightTime).as("__t"), lit(1).as("__side"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)

    // backward: ascending time, right-before-left at ties, carry last right
    // forward: same carry over descending time (= nearest following right)
    val ord =
      if (fwd) Seq(col("__t").desc, col("__side").desc)
      else Seq(col("__t").asc, col("__side").desc)
    val w = Window.partitionBy(on.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lSide.unionByName(rSide)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 0)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightPayload.map(c => col(s"__m.$c").as(s"$rightPrefix$c")): _*)
  }
}
