package graft.engine

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** [[Fs.deleteRecursively]] — the shutdown-hook reaper's delete must remove
  * a tree without ever following a symlink out of it. */
class FsSpec extends AnyFunSuite {

  test("deletes a nested tree and tolerates a missing root") {
    val root = Files.createTempDirectory("fs_spec_").toFile
    val sub = new java.io.File(root, "a/b")
    assert(sub.mkdirs())
    Files.write(Paths.get(sub.getPath, "f.txt"), "x".getBytes)
    Fs.deleteRecursively(root)
    assert(!root.exists())
    Fs.deleteRecursively(root) // second call on a gone path is a no-op
    assert(!root.exists())
  }

  test("unlinks a symlink to an outside directory without deleting its contents") {
    val outside = Files.createTempDirectory("fs_spec_target_")
    val keep = outside.resolve("keep.txt")
    Files.write(keep, "precious".getBytes)
    val reaped = Files.createTempDirectory("fs_spec_reaped_")
    val link = reaped.resolve("link_to_outside")
    Files.createSymbolicLink(link, outside)
    Fs.deleteRecursively(reaped.toFile)
    assert(!Files.exists(reaped))
    assert(Files.exists(keep), "symlink target contents must survive the reap")
    Fs.deleteRecursively(outside.toFile)
  }

  test("a symlink ROOT is unlinked, its target left intact") {
    val outside = Files.createTempDirectory("fs_spec_root_target_")
    Files.write(outside.resolve("keep.txt"), "precious".getBytes)
    val link = Files.createTempDirectory("fs_spec_linkdir_").resolve("ln")
    Files.createSymbolicLink(link, outside)
    Fs.deleteRecursively(link.toFile)
    assert(!Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
    assert(Files.exists(outside.resolve("keep.txt")))
    Fs.deleteRecursively(outside.toFile)
    Fs.deleteRecursively(link.getParent.toFile)
  }
}
