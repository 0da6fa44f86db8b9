package graft.streaming

import graft.SparkSpec
import graft.operators.LayoutOps
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** The streamed lake's maintenance verb: [[LakeStreamWriter.compactShards]]
  * must fold each shard directory's per-batch part files into one file
  * while changing NOTHING a reader can observe — the zone-skip audit, the
  * landed row multiset, and the shard directory set are all bit-identical
  * before and after (read-side correctness never depended on compaction;
  * this proves the compactor kept it that way). */
class LakeCompactionSpec extends SparkSpec {

  private def shardDirs(root: String): Seq[String] =
    list(Paths.get(root)).map(_.getFileName.toString)
      .filter(_.startsWith("hshard=")).sorted

  private def dataFiles(root: String): Seq[String] = {
    def walk(p: Path): Seq[Path] =
      if (Files.isDirectory(p)) list(p).flatMap(walk) else Seq(p)
    walk(Paths.get(root)).map(_.getFileName.toString)
      .filter(n => !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet"))
  }

  private def list(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toSeq finally s.close()
  }

  test("compactShards: audit and rows bitwise unchanged, one file per shard") {
    val out = Files.createTempDirectory("lake-compact").resolve("shards").toString
    val rows = LayoutOps.quantizedLineitem(spark, sfDir)
    // two appends carve the identical corpus the batch writer lands, so the
    // tree is genuinely fragmented (>= 2 files in every touched shard) —
    // the streamed writer's shape without running a stream
    LayoutOps.landHilbertShards(rows.filter(col("l_orderkey") % 2 === 0), out, "append")
    LayoutOps.landHilbertShards(rows.filter(col("l_orderkey") % 2 === 1), out, "append")
    val dirsBefore = shardDirs(out)
    val filesBefore = dataFiles(out).size
    assert(filesBefore > dirsBefore.size, "precondition: the lake is fragmented")
    def audit() = LayoutOps.hilbertTreeAudit(spark, out).collect().map(_.toSeq).toSeq
    def landed() = spark.read.parquet(out)
      .select(col("hshard").cast("long"), col("l_orderkey"), col("qx"),
        col("qy"), col("hd"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val auditBefore = audit()
    val rowsBefore = landed()

    LakeStreamWriter.compactShards(spark, out)

    assert(shardDirs(out) === dirsBefore, "the shard directory set is unchanged")
    assert(dataFiles(out).size === dirsBefore.size,
      s"exactly one file per shard after the fold (was $filesBefore)")
    assert(audit() === auditBefore, "the zone-skip audit is bitwise unchanged")
    assert(landed() === rowsBefore, "the landed row multiset is bitwise unchanged")
    // no staging or retirement debris is left behind (both live inside
    // the root — the verb never touches anything beside it)
    assert(list(Paths.get(out)).forall { p =>
      val n = p.getFileName.toString
      !n.startsWith(".retired-") && !n.startsWith(".graft-compact")
    })
  }

  test("repairShards heals an interrupted swap: rollback, debris sweep, then compaction succeeds") {
    val out = Files.createTempDirectory("lake-repair").resolve("shards").toString
    LayoutOps.landHilbertShards(
      LayoutOps.quantizedLineitem(spark, sfDir), out, "append")
    def landed() = spark.read.parquet(out)
      .select(col("hshard").cast("long"), col("l_orderkey"), col("qx"),
        col("qy"), col("hd"))
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val rowsBefore = landed()
    val dirs = shardDirs(out)
    assert(dirs.size >= 2, "need two shards to stage both crash states")
    val rootP = Paths.get(out)
    // crash state A — between retire and replace: the shard dir sits at
    // its dot-prefixed retire name, INVISIBLE to readers (the silent-loss
    // window the repair exists for)
    val victim = dirs.head
    Files.move(rootP.resolve(victim), rootP.resolve(s".retired-$victim"))
    assert(!landed().keySet.exists(_.head == victim.stripPrefix("hshard=").toLong),
      "precondition: the un-repaired tree silently misses the shard")
    // crash state B — after a completed swap: superseded retired debris
    // beside a live shard
    val other = dirs.last
    val debris = rootP.resolve(s".retired-$other")
    Files.createDirectories(debris)
    Files.write(debris.resolve("stale.parquet"), Array[Byte](1, 2, 3))
    // plus TWO staging dirs inside the root: one aged past the grace
    // window (a crashed compaction's debris — must be swept) and one
    // fresh (a LIVE compaction mid-write — must be left alone; sweeping
    // it was the r16 advisor race)
    val staleStage = Files.createDirectories(
      rootP.resolve(".graft-compact-stale"))
    Files.write(staleStage.resolve("junk"), Array[Byte](9))
    Files.setLastModifiedTime(staleStage, java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - LakeStreamWriter.StagingGraceMs - 60000))
    val liveStage = Files.createDirectories(
      rootP.resolve(".graft-compact-live"))
    Files.write(liveStage.resolve("inflight"), Array[Byte](7))

    LakeStreamWriter.repairShards(out)

    assert(shardDirs(out) === dirs, "rollback restored the missing shard")
    assert(landed() === rowsBefore, "healed tree reads bit-identically")
    assert(list(rootP).forall(p => !p.getFileName.toString.startsWith(".retired-")),
      "completed-swap debris was swept")
    assert(!Files.exists(staleStage), "aged-out staging was swept")
    assert(Files.exists(liveStage.resolve("inflight")),
      "staging younger than the grace window is presumed live and kept")
    graft.core.FsUtil.deleteRecursively(liveStage) // clean up for the re-run below
    // an interrupted compaction heals by simply re-running it
    Files.move(rootP.resolve(victim), rootP.resolve(s".retired-$victim"))
    LakeStreamWriter.compactShards(spark, out)
    assert(landed() === rowsBefore)
    assert(dataFiles(out).size === dirs.size)
  }

  test("concurrent readers racing the read-touch repair: no exception escapes, tree heals once") {
    // the r15 advisor race: repairShards runs on EVERY streamedLakeRoot
    // return, so two simultaneous readers could race Files.move /
    // deleteRecursively on the same .retired-* debris and the loser threw
    // an uncaught FileSystemException — failing a READ. The per-root
    // monitor (plus lost-race tolerance) must let N concurrent callers
    // all return cleanly with the tree healed exactly as a solo call.
    val out = Files.createTempDirectory("lake-repair-race").resolve("shards").toString
    LayoutOps.landHilbertShards(
      LayoutOps.quantizedLineitem(spark, sfDir), out, "append")
    val rootP = Paths.get(out)
    val dirs = shardDirs(out)
    assert(dirs.size >= 2)
    // stage BOTH crash states again: a rollback-pending shard and
    // completed-swap debris, the two contended Files.move/delete paths
    val victim = dirs.head
    Files.move(rootP.resolve(victim), rootP.resolve(s".retired-$victim"))
    val debris = rootP.resolve(s".retired-${dirs.last}")
    Files.createDirectories(debris)
    Files.write(debris.resolve("stale.parquet"), Array[Byte](1, 2, 3))
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val gate = new java.util.concurrent.CyclicBarrier(8)
    val ts = (0 until 8).map { _ =>
      new Thread(() => try {
        gate.await()
        (0 until 25).foreach(_ => LakeStreamWriter.repairShards(out))
      } catch { case e: Throwable => failures.add(e) })
    }
    ts.foreach(_.start()); ts.foreach(_.join(120000))
    assert(failures.isEmpty,
      s"racing repairs must not surface exceptions: ${failures.peek()}")
    assert(shardDirs(out) === dirs, "rollback landed exactly once")
    assert(list(rootP).forall(p => !p.getFileName.toString.startsWith(".retired-")),
      "debris swept")
  }
}
