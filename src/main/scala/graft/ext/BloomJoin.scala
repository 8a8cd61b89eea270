package graft.ext

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit Bloom-filter join pruning — the "runtime filter" pattern as a
  * first-class operator. For a selective join (a huge fact side joined to a
  * filtered dimension), the dominant 100 TB cost is shuffling fact rows that
  * will never match. A Bloom filter of the build-side keys, broadcast into a
  * scan-side predicate, drops the non-matching rows BEFORE the shuffle:
  *
  *   1. build: one distributed aggregation over the small side's keys
  *      (`DataFrameStatFunctions.bloomFilter`, spark-sketch);
  *   2. probe: `bloom_might_contain(key, <filter bytes>)` — a codegen'd
  *      predicate (see [[graft.functions.BloomProbe]]) evaluated inside the
  *      fact scan's WholeStageCodegen span, next to the pushed filters;
  *   3. verify: the surviving rows (matches + ~fpp false positives) flow
  *      into the EXACT join, so results are identical to the unpruned plan.
  *
  * Sizing: the filter costs ~1.44·log2(1/fpp) bits per distinct key
  * (~7.2 bits at fpp=3%) — 10M keys ≈ 9 MB broadcast, the usual knee where
  * a semi-join's full shuffle is worth trading against a task-binary
  * broadcast. Spark's own optimizer injects such filters only behind
  * heuristics; this operator makes the decision explicit and composable.
  */
object BloomJoin {

  /** Serialized Bloom filter of `keys` (integral column) of `df`. */
  def buildFilter(df: DataFrame, key: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val bf = df.stat.bloomFilter(key, expectedItems, fpp)
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Bloom-probe predicate over a pre-built serialized filter. */
  def mightContain(key: Column, filterBytes: Array[Byte]): Column =
    call_function("bloom_might_contain", key, lit(filterBytes))

  /** Exact left-semi join of `large` on `small`, with the shuffle fed only
    * by Bloom-surviving rows. Result rows are exactly the plain semi-join's
    * (false positives are re-checked by the join; false negatives cannot
    * occur). `expectedItems` should be >= the small side's distinct-key
    * count — oversizing wastes broadcast bytes, undersizing inflates fpp. */
  def semiJoin(large: DataFrame, largeKey: String,
      small: DataFrame, smallKey: String,
      expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val filter = buildFilter(small, smallKey, expectedItems, fpp)
    large.where(mightContain(col(largeKey), filter))
      .join(small, col(largeKey) === small(smallKey), "left_semi")
  }
}
