package graft.queries

/** One JVM-wide shutdown hook reaping every registered scratch dir (staged
  * stream batches, per-run warehouses) — a hook per query run would
  * accumulate one live Thread per Bench/Verify pass. Dirs must be
  * self-created scratch; deletion is symlink-safe
  * ([[graft.engine.Fs.deleteRecursively]] never follows links). Reap rides
  * JVM exit because registered queries return LAZY frames planned over
  * files inside these dirs — eager cleanup would break a later consume. */
private[queries] object TmpReaper {
  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  sys.addShutdownHook {
    dirs.forEach(d => graft.engine.Fs.deleteRecursively(new java.io.File(d)))
  }
  def register(dir: String): String = { dirs.add(dir); dir }
}

/** Shared batch-file staging for the streaming-contract queries (q177/q178
  * incremental-CC, q181 near-dup): each slice lands as ONE single-file
  * parquet batch `<tmp>/in/batch_<startIndex+i>.parquet`, so a file-source
  * stream with `maxFilesPerTrigger = 1` delivers each slice as its own
  * micro-batch. `startIndex` lets a restart-boundary query stage later
  * batches into the same dir without clobbering earlier ones (q178).
  * `pinMtime` gives the files strictly ascending modification times — the
  * file source orders discovery by timestamp, so batch ORDER becomes
  * deterministic where the fold is order-sensitive (first-seen-wins
  * near-dup; the CC fold is order-insensitive and skips it). Returns the
  * input dir. */
private[queries] object Staging {
  import java.nio.file.{Files, Path, Paths}
  import java.nio.file.attribute.FileTime
  import scala.jdk.CollectionConverters._

  def stageBatches(slices: Seq[org.apache.spark.sql.DataFrame], tmp: String,
      startIndex: Int = 0, pinMtime: Boolean = false): String = {
    val inDir = s"$tmp/in"
    Files.createDirectories(Paths.get(inDir))
    // Discovery-order mtimes: the file source orders files by timestamp, so
    // batch_i must carry a strictly ascending mtime whether pinned (fixed
    // epoch — deterministic order for order-SENSITIVE folds) or not (the
    // old per-slice loop got ascending times for free from its serial
    // writes; the one-job path writes every file in the same instant and
    // must set them explicitly).
    // non-pinned stamps are spaced 1 s apart (not 1 ms): a filesystem that
    // truncates mtime to whole seconds would otherwise collapse every batch
    // staged by one job to the same timestamp, making discovery order
    // arbitrary. Slightly-future mtimes are harmless to the file source.
    def stampMtime(dst: Path, i: Int): Unit =
      Files.setLastModifiedTime(dst, FileTime.fromMillis(
        if (pinMtime) 1700000000000L + i * 60000L
        else System.currentTimeMillis() + (i - startIndex).toLong * 1000L))
    def movePart(stage: String, i: Int): Unit = {
      val listing = Files.list(Paths.get(stage))
      val part = try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written under $stage"))
        finally listing.close() // Files.list holds an open directory fd
      val dst = Paths.get(s"$inDir/batch_$i.parquet")
      Files.move(part, dst)
      stampMtime(dst, i)
    }
    // single-slice fallback (also the empty-slice backfill): one
    // scan+coalesce(1) write job for this slice alone
    def stageOne(df: org.apache.spark.sql.DataFrame, i: Int): Unit = {
      val stage = s"$tmp/stage_$i"
      df.coalesce(1).write.parquet(stage)
      movePart(stage, i)
      // the moved batch file is the only artifact the stream needs; the
      // stage dir (_SUCCESS/.crc leftovers) would otherwise accumulate one
      // staged copy per iteration for the life of the JVM under a Bench loop
      graft.engine.Fs.deleteRecursively(new java.io.File(stage))
    }
    val schemas = slices.map(_.schema.map(f => (f.name, f.dataType)))
    // conf valve (A/B instrument + ops escape hatch): false restores the
    // one-write-job-per-slice loop
    val oneJob = slices.headOption.forall(
      _.sparkSession.conf.get("spark.graft.staging.oneJob", "true").toBoolean)
    // the batch tag column is reserved: a slice that already carried one
    // would be silently overwritten and stripped by partitionBy — fail loud
    require(slices.forall(!_.columns.contains("__b")),
      "stageBatches: slices must not carry a reserved __b column")
    if (oneJob && slices.size > 1 && schemas.forall(_ == schemas.head)) {
      // ONE job for every slice: tag each with its batch index, cluster by
      // the tag, dynamic-partitioned write → exactly one part file per
      // batch value (each value lands in one task), then move each into
      // place. The per-slice loop this replaces paid one full scan+write
      // JOB per slice, serially — at the contract SFs those serial fixed
      // costs (job scheduling, write commit) dominated the staging phase
      // of every streaming-contract query (measured on the q187 shape:
      // 4 slices staged in 1.33 s warm; one job stages them in ~0.5 s).
      // Row ORDER within a batch file becomes shuffle-merge order — fine:
      // every staged slice feeds watermarked aggregates, joins, dedup, CC
      // folds, or processors that sort within the batch; none consume
      // file row order (the oracle gate re-proves each round).
      val tagged = slices.zipWithIndex.map { case (df, k) =>
        df.withColumn("__b", org.apache.spark.sql.functions.lit(startIndex + k))
      }.reduce(_ unionByName _)
      val stage = s"$tmp/stage_all_$startIndex"
      tagged
        .repartition(slices.size, org.apache.spark.sql.functions.col("__b"))
        .write.partitionBy("__b").parquet(stage)
      slices.indices.foreach { k =>
        val i = startIndex + k
        val dir = s"$stage/__b=$i"
        if (Files.isDirectory(Paths.get(dir))) movePart(dir, i)
        // an empty slice writes no partition directory: back-fill the
        // empty single-file batch the old loop produced
        else stageOne(slices(k).limit(0), i)
      }
      graft.engine.Fs.deleteRecursively(new java.io.File(stage))
    } else {
      slices.zipWithIndex.foreach { case (df, k) => stageOne(df, startIndex + k) }
    }
    inDir
  }
}
