package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation plus (where
  * SQL-expressible) an equivalent DuckDB oracle over the same parquet tables.
  *
  * Determinism contract (SURVEY.md §7.4): every query's output is totally
  * ordered by a unique key, aggregate doubles are rounded, and computed
  * integers are cast to BIGINT on both sides, so the driver's column-sorted
  * value hash matches bit-for-bit.
  */
final case class QDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)
