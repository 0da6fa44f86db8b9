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

  /** Session-scoped SCRATCH directory — tmpfs (/dev/shm) when available,
    * else java.io.tmpdir. The replay harness moved its checkpoints and
    * sinks to tmpfs in r8 because per-micro-batch fsync/rename metadata
    * churn on a disk-backed /tmp dominated small replays' wall time; r17
    * extends the same placement to the other ephemeral artifacts the
    * bench rebuilds every run (streamed-lake shards, index roots, staging
    * slices, export trees). These are per-session intermediates deleted
    * at exit, never cross-run state; a production deployment gives each
    * a durable path, where the equivalent lever is the object store's
    * commit protocol, not tmpfs.
    * Placement can be forced with `GRAFT_SCRATCH_DIR` (e.g. a big disk
    * path when tmpfs is too small for the SF being run), and tmpfs is
    * only chosen while it has usable headroom (r17 advisor: /dev/shm is
    * typically capped at 50% of RAM, and an ENOSPC mid-bench at a larger
    * SF would fail where the old disk-backed /tmp succeeded). */
  private[graft] val ScratchMinUsableBytes = 8L * 1024 * 1024 * 1024
  def scratchDir(prefix: String): Path = {
    val forced = sys.env.get("GRAFT_SCRATCH_DIR").map(java.nio.file.Paths.get(_))
    val shm = java.nio.file.Paths.get("/dev/shm")
    val root = forced.filter(p => Files.isDirectory(p) && Files.isWritable(p))
      .getOrElse {
        val shmOk = Files.isDirectory(shm) && Files.isWritable(shm) &&
          (try Files.getFileStore(shm).getUsableSpace >= ScratchMinUsableBytes
           catch { case _: Throwable => false })
        if (shmOk) shm
        else java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      }
    Files.createTempDirectory(root, prefix)
  }
}
