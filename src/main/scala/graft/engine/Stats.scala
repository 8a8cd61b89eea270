package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style column statistics — the profile (row count, null count,
  * distinct count, numeric min/max) a catalog keeps per column for
  * optimizer costing and data-quality monitoring. The reference's tables
  * are profiled implicitly by Spark's `saveAsTable`; this is the explicit,
  * engine-owned surface.
  *
  * Shape: one `stack` unpivot (rows × columns — the inherent ANALYZE
  * read) into a single keyed aggregate over (column, value). Exact NDV
  * shuffles per-column distinct values; at 100 TB pass `approxNdv = true`
  * to swap in HyperLogLog (`approx_count_distinct`) and keep the whole
  * profile one map-side-combinable aggregate with O(sketch) state.
  *
  * Values ride the unpivot as strings (cast is injective per column —
  * equal counts either way); numeric min/max are taken on a parallel
  * double-cast lane, null for non-numeric columns.
  */
object Stats {

  private def isNumeric(t: DataType): Boolean = t match {
    case _: NumericType => true
    case _ => false
  }

  def columnStats(df: DataFrame, approxNdv: Boolean = false): DataFrame = {
    val branches = df.schema.fields.map { f =>
      val num = if (isNumeric(f.dataType)) s"cast(`${f.name}` as double)"
        else "cast(null as double)"
      s"'${f.name}', cast(`${f.name}` as string), $num"
    }
    val stacked = df.selectExpr(
      s"stack(${df.schema.length}, ${branches.mkString(", ")}) as (col_name, strval, numval)")
    val ndv =
      if (approxNdv) approx_count_distinct(col("strval")).as("ndv")
      else countDistinct(col("strval")).as("ndv")
    stacked.groupBy("col_name")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("strval").isNull, 1L).otherwise(0L)).as("n_nulls"),
        ndv,
        min("numval").as("min_num"),
        max("numval").as("max_num"))
  }
}
