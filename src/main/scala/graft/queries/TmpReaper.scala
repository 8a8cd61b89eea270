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
