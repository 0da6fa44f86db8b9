package graft.core

import java.nio.file.{Files, Path}

/** Shared local-filesystem helpers (no Spark dependency). */
object FsUtil {

  /** Recursively delete a file tree; no-op on a missing path. Directory
    * streams are closed explicitly — `Files.list` leaks a directory fd
    * otherwise, and `File.delete` on a non-empty dir is a silent no-op,
    * which is exactly the pattern this helper exists to centralize
    * (previously four hand-rolled copies across storage/engine/streaming). */
  def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().forEachRemaining(deleteRecursively(_))
      finally s.close()
    }
    Files.deleteIfExists(p)
  }

  /** Register a whole tree for deletion at JVM exit (File.deleteOnExit is
    * per-file and silently no-ops on non-empty dirs — this walks the tree
    * once at shutdown instead). For long-lived JVM-cached temp dirs whose
    * lifetime genuinely is the session. */
  def deleteOnExitRecursively(p: Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try deleteRecursively(p) catch { case _: Throwable => () }))
}
