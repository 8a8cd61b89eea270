package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
