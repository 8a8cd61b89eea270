package graft.engine

/** Tiny local-filesystem helpers shared by the engine's durable-state and
  * staging paths (the incremental-CC sink's commit pruning, q177's staged
  * batch cleanup). Local FS only — cluster state dirs go through Hadoop's
  * FileSystem API via Spark itself. */
private[graft] object Fs {
  /** Recursive delete; does not follow symlinks out of the tree
    * (`listFiles` lists the link itself, `delete` removes the link). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
