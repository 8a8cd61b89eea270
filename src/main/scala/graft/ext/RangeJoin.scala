package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed range (interval) join — match points to the closed intervals
  * `[lo, hi]` containing them, with optional extra equi keys. Spark plans a
  * bare range predicate as a BroadcastNestedLoopJoin over |P|x|I| pairs —
  * quadratic, fatal beyond toy scale. This is the standard bucketed
  * reformulation (the binning technique documented publicly for SQL
  * range-join optimization and Flink's interval join):
  *
  *   - every point lands in exactly ONE fixed-width bucket
  *     (`floorDiv(value, width)`);
  *   - every interval explodes to the buckets it overlaps
  *     (`sequence(floorDiv(lo), floorDiv(hi))`) — `(hi-lo)/width + 1` rows;
  *   - an equi shuffle join on the bucket id (plus user keys) finds every
  *     candidate pair, and the exact `lo <= p <= hi` predicate verifies.
  *
  * Because a point has exactly one bucket and an interval's exploded bucket
  * ids are distinct, each qualifying (point, interval) pair is emitted
  * exactly once — no post-dedup.
  *
  * Cost: one shuffle of |P| + |I|·(span/width + 1) rows on the bucket key —
  * linear, AQE-skew-splittable, and broadcastable when the exploded interval
  * side is small. Pick `bucketWidth` near the TYPICAL interval span: much
  * smaller multiplies the interval fan-out, much larger turns the bucket
  * join into a near-cross-join within buckets. Values must be integers
  * (cast timestamps to `unix_millis` first — exact, engine-portable
  * arithmetic; no floating-point bucket edges).
  */
object RangeJoin {

  /** Floor division that is exact for any Long and safely negative-aware:
    * subtract the non-negative `pmod` remainder, then the integral divide is
    * exact (no toward-zero truncation error, no double rounding). */
  private[ext] def floorDiv(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Join `points` rows to every `intervals` row whose `[loCol, hiCol]`
    * (closed, integer-valued) contains `pointCol`, matching `keys` exactly.
    * Output carries all columns of both inputs (names must not collide). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String, bucketWidth: Long,
      keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", floorDiv(col(pointCol), bucketWidth))
    val i = intervals
      .where(col(loCol) <= col(hiCol))
      .withColumn("__bucket", explode(sequence(
        floorDiv(col(loCol), bucketWidth), floorDiv(col(hiCol), bucketWidth))))
    p.join(i, (keys :+ "__bucket").toSeq)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-overlap join: pairs of rows whose closed intervals intersect.
    * Reduction to point-in-interval: left's START point inside right's
    * interval catches every overlap where right starts first; the flipped
    * orientation catches the rest (strictly-later left starts, so no pair
    * is double-counted). */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      leftLo: String, leftHi: String, rightLo: String, rightHi: String,
      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    val startsInside = pointInInterval(
      left, right, leftLo, rightLo, rightHi, bucketWidth, keys)
    val startsBefore = pointInInterval(
      right, left, rightLo, leftLo, leftHi, bucketWidth, keys)
      .where(col(rightLo) > col(leftLo)) // equality handled by startsInside
      .select(startsInside.columns.toSeq.map(col): _*)
    startsInside.unionByName(startsBefore)
  }
}
