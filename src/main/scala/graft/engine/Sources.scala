package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Source readers beyond the parquet tables (SURVEY.md §2.1): CSV with
  * header + schema inference (the reference's dedupe-corpus load,
  * `/root/reference/config/aml_config.py:87-94`) and binary files (the
  * blob-ingestion path for multimodal media,
  * `02_aml_address_verification.py:59-73`).
  */
object Sources {

  /** `spark.read.option("header").option("inferSchema").csv` — identical
    * surface to the reference. Inference scans once; at scale pass an
    * explicit schema instead (the extra arg) to skip that pass. */
  def csv(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame = {
    val base = spark.read.option("header", "true")
    schema match {
      case Some(ddl) => base.schema(ddl).csv(path)
      case None => base.option("inferSchema", "true").csv(path)
    }
  }

  /** Binary-file source: one row per file with path/length/content —
    * the distributed replacement for the reference's driver-side local
    * image files. */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** JSON-lines source (the interchange format of most raw LLM corpora).
    * As with CSV, pass an explicit DDL schema at scale to skip the
    * inference pass. */
  def jsonLines(spark: SparkSession, path: String,
      schema: Option[String] = None): DataFrame =
    schema match {
      case Some(ddl) => spark.read.schema(ddl).json(path)
      case None => spark.read.json(path)
    }

  /** ORC source — the other columnar format Spark reads vectorized with
    * pushdown/pruning; round-trips the same scale properties as parquet. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Plain-text source: one row per line (`value: string`), or one row per
    * file with `wholetext` — the rawest corpus ingestion shape (crawl dumps,
    * log shards). Splittable per line, so a 100 TB directory parallelizes
    * by HDFS block like any other file source. */
  def text(spark: SparkSession, path: String, wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)

  /** Z-order clustering layout (the `OPTIMIZE ZORDER BY` write shape):
    * range-partition into `numFiles` output splits by the Morton code of
    * the given pre-binned integral columns and sort each split by it, so
    * every written file covers a small hyper-rectangle of the key space —
    * parquet min/max footer stats then prune row groups for predicates on
    * ANY z-ed dimension, not just a lexicographic sort's leading one.
    * That multi-dimensional skipping is the point at 100 TB: a single-sort
    * layout answers `WHERE a BETWEEN ...` from few row groups but scans
    * everything for `WHERE b BETWEEN ...`; the z-layout bounds both
    * (ZOrderSpec measures the footer spans). The z column is dropped
    * before the write — layout only, no schema change.
    *
    * Inputs must already be binned into `[0, 2^(63/n))` (see
    * [[graft.functions.ZOrderAlgo]]); use [[widthBucket]] for numeric or
    * date-derived domains. */
  def zOrderLayout(df: DataFrame, zcols: Seq[Column], numFiles: Int): DataFrame =
    df.withColumn("__graft_zv", call_function("z_value", zcols: _*))
      .repartitionByRange(numFiles, col("__graft_zv"))
      .sortWithinPartitions(col("__graft_zv"))
      .drop("__graft_zv")

  /** Equi-width binning of a numeric column into `[0, buckets)` for
    * [[zOrderLayout]] — the two-number (min, max) layout-time stats pass
    * every clustering write does (Delta's OPTIMIZE gathers the same).
    * Values at the max edge clamp into the last bucket. */
  def widthBucket(df: DataFrame, c: Column, buckets: Int): Column = {
    val row = df.agg(min(c).cast("double"), max(c).cast("double")).head()
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    if (hi <= lo) lit(0L)
    else least(lit(buckets - 1L),
      floor((c.cast("double") - lit(lo)) / lit((hi - lo) / buckets)).cast("long"))
  }
}
