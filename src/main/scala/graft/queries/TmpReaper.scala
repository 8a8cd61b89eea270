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
  def stageBatches(slices: Seq[org.apache.spark.sql.DataFrame], tmp: String,
      startIndex: Int = 0, pinMtime: Boolean = false): String = {
    import java.nio.file.{Files, Paths}
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val inDir = s"$tmp/in"
    Files.createDirectories(Paths.get(inDir))
    slices.zipWithIndex.foreach { case (df, k) =>
      val i = startIndex + k
      val stage = s"$tmp/stage_$i"
      df.coalesce(1).write.parquet(stage)
      val listing = Files.list(Paths.get(stage))
      val part = try listing.iterator().asScala
          .find(_.getFileName.toString.endsWith(".parquet"))
          .getOrElse(sys.error(s"no parquet part written under $stage"))
        finally listing.close() // Files.list holds an open directory fd
      val dst = Paths.get(s"$inDir/batch_$i.parquet")
      Files.move(part, dst)
      // the moved batch file is the only artifact the stream needs; the
      // stage dir (_SUCCESS/.crc leftovers) would otherwise accumulate one
      // staged copy per iteration for the life of the JVM under a Bench loop
      graft.engine.Fs.deleteRecursively(new java.io.File(stage))
      if (pinMtime)
        Files.setLastModifiedTime(dst,
          FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    inDir
  }
}
