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
    val root = f.toPath
    if (Files.exists(root, LinkOption.NOFOLLOW_LINKS)) {
      Files.walkFileTree(root, new SimpleFileVisitor[Path] {
        override def visitFile(p: Path, attrs: BasicFileAttributes): FileVisitResult = {
          Files.deleteIfExists(p); FileVisitResult.CONTINUE
        }
        override def visitFileFailed(p: Path, e: IOException): FileVisitResult = {
          Files.deleteIfExists(p); FileVisitResult.CONTINUE
        }
        override def postVisitDirectory(dir: Path, e: IOException): FileVisitResult = {
          Files.deleteIfExists(dir); FileVisitResult.CONTINUE
        }
      })
      ()
    }
  }
}
