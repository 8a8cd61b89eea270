package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table access layer over the driver-generated parquet dirs
  * (`/root/testdata/sf*`, see TESTDATA.md).
  *
  * Mirrors the reference's managed-table catalog
  * (`/root/reference/config/aml_config.py:34-94`: per-user database, tables
  * loaded from parquet/csv and read back with `spark.read.table`) — here a
  * parquet-dir-backed registry plus temp views, since the Delta jar is not in
  * the environment.
  *
  * Scale note: `spark.read.parquet` gives Spark's vectorized columnar scan
  * with predicate pushdown and column pruning; at 100 TB the same call reads a
  * partitioned directory tree and Catalyst prunes partitions — nothing here
  * assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Some testdata generations write events.ts as TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects; the legacy conf reads nanos as
    * long. Verify/Bench/SparkTestBase set it at session construction; the
    * set-if-needed here covers externally-created sessions (e.g. the
    * driver calling SparkEntry.entry directly, the plan-dump REPL) and
    * never overrides an explicit caller value of "true". Exposed for call
    * sites that read the events parquet OUTSIDE [[load]] (the q168
    * streaming scan). */
  def ensureNanosConf(spark: SparkSession): Unit = {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(nanosKey).contains("true"))
      spark.conf.set(nanosKey, "true")
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosConf(spark)
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Normalize events.ts to TimestampType regardless of how this testdata
    // generation encoded it, so every downstream query and oracle sees one
    // type: nanos-as-long (TIMESTAMP(NANOS) files) is floored to Spark's
    // native microsecond precision — `pmod` keeps it a floor, not a
    // toward-zero truncation, for pre-epoch nanos; plain double division
    // would lose precision above 2^53 nanos — while micro-precision files
    // (read as TIMESTAMP_NTZ under the UTC sessions all entry points pin)
    // just cast, which preserves the wall-clock instant.
    if (name == "events") normalizeEventsTs(df) else df
  }

  /** The events.ts normalization applied by [[load]], exposed separately
    * so a STREAMING scan of the same files (readStream.schema(...).parquet)
    * can apply the identical cast — it is a plain projection, so it is
    * valid on streaming DataFrames too. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Register every testdata table as a temp view (reference pattern:
    * `createOrReplaceTempView`, `01_aml_network_analysis.py:147,206`). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** Minimal managed-table catalog: overwrite-parquet + re-register view.
  * Covers the reference's `df.write.format("delta").mode('overwrite')
  * .saveAsTable(...)` (`01_aml_network_analysis.py:245`) and
  * `option("overwriteSchema","true")` (a no-op for overwrite-by-path parquet).
  */
final class Catalog(spark: SparkSession, warehouseDir: String) {
  def save(name: String, df: DataFrame): Unit = {
    val path = s"$warehouseDir/$name"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }
  def table(name: String): DataFrame = spark.table(name)
  def drop(name: String): Unit = spark.catalog.dropTempView(name)

  /** SHOW TABLES (reference `config/aml_config.py:67`): names visible in
    * the session — temp views plus catalog tables. */
  def listTables(): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** Hive-style partitioned table: one directory per partition value, so
    * filters on the partition column become partition PRUNING — the scan
    * never lists, opens, or reads non-matching directories. The layout
    * strategy for every time/tenant/language-sliced 100 TB table (pick a
    * column with bounded cardinality; high-cardinality partitioning
    * produces the small-files problem bucketing solves instead). */
  def savePartitioned(name: String, df: DataFrame, partitionCol: String): Unit = {
    val path = s"$warehouseDir/$name"
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  /** Bucketed managed table: co-locates rows by hash(bucketCol) at write
    * time so later equi-joins/aggregations on that key skip the exchange
    * entirely — the pre-shuffle strategy for repeatedly-joined 100 TB
    * fact tables (SURVEY.md §7.4 risk 5 / "bucketing" in the scale rules).
    * Requires a real catalog table (temp views cannot carry bucket specs).
    */
  def saveBucketed(name: String, df: DataFrame, bucketCol: String,
      numBuckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.write.mode("overwrite")
      .format("parquet")
      .option("path", s"$warehouseDir/$name")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)
  }

  /** Compact a managed table to `targetFiles` output files — the
    * small-files remedy for tables accreted by many upserts/streaming
    * micro-batches (a 100 TB table with millions of tiny files pays its
    * cost in scan task overhead and namenode pressure, not bytes).
    * `coalesce` avoids a shuffle when reducing; the compacted snapshot is
    * written as a new versioned directory like [[upsert]]. */
  def compact(name: String, targetFiles: Int): Unit = {
    require(targetFiles >= 1, "targetFiles must be >= 1")
    val snap = table(name).coalesce(targetFiles)
    val path = nextVersionPath(name)
    snap.write.mode("errorifexists").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }

  private val versionDirPattern = "__v(\\d+)".r

  /** Next snapshot path, derived from what is ON DISK rather than an
    * in-memory counter: a fresh Catalog over an existing warehouse must
    * not regenerate `__v1` (the `errorifexists` write would throw), and
    * two catalogs over the same dir must not collide on restart. */
  private def nextVersionPath(name: String): String = {
    val next = existingVersions(name).lastOption.map(_._1 + 1).getOrElse(1L)
    s"$warehouseDir/$name/__v$next"
  }

  /** Version-number-sorted `(version, dir)` snapshot list under a table. */
  private def existingVersions(name: String): Seq[(Long, java.io.File)] = {
    val base = new java.io.File(s"$warehouseDir/$name")
    val dirs = Option(base.listFiles()).getOrElse(Array.empty)
    dirs.toSeq.flatMap { d =>
      d.getName match {
        case versionDirPattern(v) if d.isDirectory => Some((v.toLong, d))
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** Time-travel read — Delta's `versionAsOf` (the reference's tables are
    * Delta and get this for free) without the Delta jar: every
    * [[upsert]]/[[compact]] wrote an immutable `__vN` snapshot directory,
    * so reading version N is reading that directory. Throws on a version
    * that never existed or was [[vacuum]]ed away (same failure mode as
    * Delta after VACUUM passes the retention window). */
  def tableVersion(name: String, version: Long): DataFrame = {
    val dir = existingVersions(name).collectFirst {
      case (v, d) if v == version => d
    }.getOrElse(throw new IllegalArgumentException(
      s"table $name has no snapshot __v$version " +
        s"(available: ${history(name).mkString(",")})"))
    spark.read.parquet(dir.getPath)
  }

  /** Snapshot versions currently readable via [[tableVersion]], oldest
    * first (Delta `DESCRIBE HISTORY`'s version column, minus the metadata
    * Delta logs and parquet files do not carry). */
  def history(name: String): Seq[Long] = existingVersions(name).map(_._1)

  /** Garbage-collect superseded snapshot directories, keeping the newest
    * `keep` (>= 1). Deliberately a separate, explicit call — upsert/compact
    * never delete, so in-flight readers of an old snapshot stay intact;
    * vacuum is for after those readers are known drained (same contract as
    * Delta's VACUUM, which the reference relies on implicitly). */
  def vacuum(name: String, keep: Int = 1): Unit = {
    require(keep >= 1, "keep must be >= 1")
    existingVersions(name).dropRight(keep).foreach { case (_, dir) =>
      Option(dir.listFiles()).getOrElse(Array.empty).foreach(_.delete())
      dir.delete()
    }
  }

  /** MERGE-style upsert — the shape of Delta's `MERGE INTO` (reference
    * tables are Delta, `01_aml_network_analysis.py:245`) without the Delta
    * jar: rows whose key matches an update take the update row wholesale,
    * unmatched existing rows are kept, brand-new keys insert. The merged
    * snapshot is written to a NEW versioned directory and the view
    * repointed — the new-files-plus-metadata-pointer swap every table
    * format (Delta/Iceberg) performs, which also sidesteps Spark's
    * cannot-overwrite-a-path-being-read restriction and leaves in-flight
    * readers of the old snapshot intact. One anti-join (broadcast-able
    * while the update batch is small; bucket both sides on the key for
    * repeated 100 TB merges) plus one union — no driver materialization. */
  def upsert(name: String, updates: DataFrame, keys: Seq[String]): Unit = {
    val current = table(name)
    val merged = current
      .join(updates.select(keys.map(org.apache.spark.sql.functions.col): _*)
        .distinct(), keys, "left_anti")
      .unionByName(updates)
    val path = nextVersionPath(name)
    merged.write.mode("errorifexists").parquet(path)
    spark.read.parquet(path).createOrReplaceTempView(name)
  }
}
