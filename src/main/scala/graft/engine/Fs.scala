package graft.engine

import java.io.IOException
import java.nio.file.{FileVisitResult, Files, LinkOption, Path, SimpleFileVisitor}
import java.nio.file.attribute.BasicFileAttributes

/** Tiny local-filesystem helpers shared by the engine's durable-state and
  * staging paths (the incremental-CC sink's commit pruning, q177's staged
  * batch cleanup). Local FS only — cluster state dirs go through Hadoop's
  * FileSystem API via Spark itself. */
private[graft] object Fs {
  /** Recursive delete that does NOT follow symlinks: `Files.walkFileTree`
    * without `FOLLOW_LINKS` visits a symlink-to-directory as a plain file,
    * so only the link itself is unlinked — a link ever landing inside a
    * reaped dir (this runs from a JVM-wide shutdown hook) can never delete
    * the link target's contents out-of-tree. (`java.io.File.listFiles`,
    * which this replaced, DOES follow directory symlinks.) Unreadable
    * entries are skipped, not fatal — best-effort cleanup. */
  def deleteRecursively(f: java.io.File): Unit = {
    // best-effort by contract: an undeletable entry (permissions, a child
    // created mid-walk leaving DirectoryNotEmptyException) must not
    // propagate — this runs inside foreachBatch commit pruning and the
    // shutdown-hook reaper, where a throw would kill the streaming query
    // or abort the remaining dirs' cleanup
    // NonFatal, not just IOException: a SecurityManager veto or a runtime
    // failure from the filesystem provider must be equally non-propagating
    def tryDelete(p: Path): Unit =
      try { Files.deleteIfExists(p); () }
      catch { case scala.util.control.NonFatal(_) => () }
    val root = f.toPath
    try {
      if (Files.exists(root, LinkOption.NOFOLLOW_LINKS)) {
        Files.walkFileTree(root, new SimpleFileVisitor[Path] {
          override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
            tryDelete(p); FileVisitResult.CONTINUE
          }
          override def visitFileFailed(p: Path, e: IOException): FileVisitResult = {
            tryDelete(p); FileVisitResult.CONTINUE
          }
          override def postVisitDirectory(dir: Path, e: IOException): FileVisitResult = {
            tryDelete(dir); FileVisitResult.CONTINUE
          }
        })
        ()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }
}
