package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, concat, count, hex, lit, substring, max => sqlMax, min => sqlMin}
import org.apache.spark.sql.types.StructType
import java.nio.file.{FileAlreadyExistsException, Files, Paths, StandardOpenOption}
import java.util.Base64
import scala.jdk.CollectionConverters._

/** A concurrent writer claimed the same version first. The losing commit
  * changed nothing on disk — re-read the table and retry. `cause` chains
  * the underlying conflict when this wraps another (retryConflicts'
  * give-up path keeps the last real conflict's stack trace). */
final class CommitConflictException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Advisory CAS-contention counters (r15): session-global, monotonic,
  * consumed by tools/CasLiveness to PRICE multi-writer goodput — never
  * by any engine decision (the safety story is the CAS itself; these
  * only measure how much work it wastes under contention).
  *   - `claim_lost`   — commits whose segment fully wrote but whose
  *     manifest hard-link lost the race (the unit of wasted work);
  *   - `read_conflict` — read-side missing-file failures folded to
  *     conflicts by [[VersionedTable.asConflict]] (a racing writer
  *     retired segments mid-read);
  *   - `wasted_bytes` — on-disk size of losing segments at the moment
  *     the loser deletes them (bytes written that no manifest will
  *     ever reference). */
object CasStats {
  private val counters = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private[sources] def add(key: String, n: Long): Unit =
    counters.computeIfAbsent(key,
      _ => new java.util.concurrent.atomic.AtomicLong()).addAndGet(n)

  /** Monotonic snapshot (0 for a counter never touched). Diff two
    * snapshots around a workload to attribute its contention cost. */
  def snapshot(): Map[String, Long] =
    Seq("claim_lost", "read_conflict", "wasted_bytes").map(k =>
      k -> Option(counters.get(k)).map(_.get()).getOrElse(0L)).toMap
}

/** One immutable segment of a [[VersionedTable]] version, with optional
  * min/max stats over the table's key column (absent on pre-stats manifests
  * or key-less tables — treated as "may contain anything"). */
final case class Segment(name: String, minKey: Option[String], maxKey: Option[String]) {
  /** Could a row with this key live here? Unknown stats ⇒ yes. The compare
    * MUST match the ordering that produced the stats: Spark's string min/max
    * ranks by unsigned UTF-8 bytes (UTF8String), which disagrees with Java's
    * UTF-16 compareTo for supplementary characters vs [U+E000, U+FFFF] — a
    * String-order compare here could silently skip a segment that holds the
    * victim. */
  def mayContain(key: String): Boolean = (minKey, maxKey) match {
    case (Some(lo), Some(hi)) =>
      Segment.utf8Compare(key, lo) >= 0 && Segment.utf8Compare(key, hi) <= 0
    case _ => true
  }
}

object Segment {
  /** Unsigned lexicographic compare of the UTF-8 encodings — Spark's
    * StringType ordering. */
  private[sources] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
}

/**
 * Minimal atomic snapshot table over Parquet with incremental appends and
 * segment-targeted deletes.
 *
 * The reference mutates SQLite rows in place, serializing writers with
 * in-process locks (reference: src/DedupeLibrary/Database/SqliteProvider.cs:29-30)
 * and transactions (SqliteProvider.cs:495). On a distributed filesystem the
 * idiomatic equivalent is write-then-publish: every mutation writes immutable
 * data, then atomically claims the next version — the commit-protocol shape
 * Delta Lake / Iceberg use.
 *
 * Commit protocol (multi-writer safe):
 *   1. write the new rows as an immutable, uniquely-named segment directory;
 *   2. write the full manifest body to a temp file;
 *   3. CLAIM the version by hard-linking the temp file to
 *      `manifest-<v+1>.txt` — link(2) fails atomically if the name exists,
 *      so of N racing writers exactly one wins; losers remove their own
 *      segment and throw a clean, retryable [[CommitConflictException]]
 *      (nothing of theirs was ever reachable). The manifest appears with its
 *      full content in one atomic step — no torn reads, no `_CURRENT`
 *      pointer to flip.
 * The current version is simply the highest manifest present. A writer that
 * dies before its claim leaves only an unreferenced segment directory —
 * readers are unaffected, the next commit succeeds, [[vacuum]] sweeps it.
 *
 * A version is a MANIFEST (list of segments + per-segment key stats), so:
 *   - `append(df)`  commits ONLY the new rows as a fresh segment — O(new
 *     data); at 100 TB appending a batch never rewrites the table;
 *   - `deleteKeys`  rewrites ONLY segments whose [min,max] key range can
 *     contain a victim key — O(touched segments), the row-delete path
 *     (reference semantics: SqliteProvider.cs:522-523); non-intersecting
 *     segment directories are never read, never rewritten;
 *   - `publish(df)` writes a full single-segment snapshot — the compaction
 *     path (O(table), rare by design).
 *
 * At 100 TB you would swap this for Delta (MERGE/OPTIMIZE/deletion vectors);
 * the engine only touches this class through the [[TableStore]] seam, so
 * that swap is confined here.
 */
class VersionedTable(spark: SparkSession, path: String, schema: StructType,
    statsCol: Option[String] = None, bucketed: Boolean = false)
    extends TableStore {

  private val dir = Paths.get(path)
  private val ManifestName = "^manifest-(\\d+)\\.txt$".r

  private def currentVersion: Long =
    if (!Files.isDirectory(dir)) -1L
    else listDir(dir).map(_.getFileName.toString)
      .collect { case ManifestName(n) => n.toLong }
      .foldLeft(-1L)(math.max)

  private def manifestPath(v: Long) = dir.resolve(s"manifest-$v.txt")

  // keys are arbitrary user strings (may contain tabs/newlines); stats are
  // base64-armored so the manifest stays line/tab-structured
  private def b64(s: String) =
    Base64.getUrlEncoder.withoutPadding.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String) = new String(Base64.getUrlDecoder.decode(s), "UTF-8")

  private def segLine(s: Segment): String = (s.minKey, s.maxKey) match {
    case (Some(lo), Some(hi)) => s"${s.name}\t${b64(lo)}\t${b64(hi)}"
    case _ => s.name
  }

  /** Segments referenced by version `v` (oldest first). */
  private def segments(v: Long): Seq[Segment] =
    if (v < 0) Nil
    else new String(Files.readAllBytes(manifestPath(v)), "UTF-8")
      .linesIterator.map(_.trim).filter(_.nonEmpty).map { line =>
        line.split("\t", -1) match {
          case Array(n, lo, hi) => Segment(n, Some(unb64(lo)), Some(unb64(hi)))
          case parts => Segment(parts(0), None, None)
        }
      }.toSeq

  private def segmentsIfExists(v: Long): Seq[Segment] =
    if (v < 0 || !Files.exists(manifestPath(v))) Nil else segments(v)

  /** Resolve (version, segments) tolerating the list-then-read race: a fast
    * concurrent writer can commit twice and retire the manifest a reader
    * just listed (the grace window keeps only v and v-1). The retry lands on
    * a newer manifest; reads stay safe under concurrent writers. */
  private def currentSnapshot(): (Long, Seq[Segment]) = {
    var attempts = 0
    while (attempts < 8) {
      val v = currentVersion
      try return (v, segments(v))
      catch { case _: java.nio.file.NoSuchFileException => attempts += 1 }
    }
    throw new IllegalStateException(
      s"manifest of $path kept vanishing mid-read after 8 attempts — writers are outpacing the grace window")
  }

  /** Current snapshot as a DataFrame; empty (with schema) before first commit. */
  override def read(): DataFrame = {
    val (_, segs) = currentSnapshot()
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(segs.map(s => dir.resolve(s.name).toString): _*)
  }

  /** Number of segments in the current version (compaction signal). */
  def segmentCount: Int = currentSnapshot()._2.size

  /** Versions whose manifests are currently retained, ascending. The
    * commit protocol keeps a one-version grace window (current and
    * current−1 — see [[commit]]'s retirement note), so this is the AS-OF
    * read horizon; a production lake widens the window by retention
    * policy (Delta/Iceberg keep N days of snapshots), which here is the
    * one constant in the retirement loop. */
  def retainedVersions: Seq[Long] =
    if (!Files.isDirectory(dir)) Nil
    else listDir(dir).map(_.getFileName.toString)
      .collect { case ManifestName(n) => n.toLong }.sorted

  /** TIME-TRAVEL read: the table AS OF a retained version — the manifest
    * is the snapshot, so reading an old version is just resolving its
    * segment list (segments are immutable; retirement only unlinks).
    * Throws for versions outside [[retainedVersions]]. */
  def readVersion(v: Long): DataFrame = {
    if (!Files.exists(manifestPath(v)))
      throw new IllegalArgumentException(
        s"version $v of $path is not retained (have: ${retainedVersions.mkString(",")})")
    val segs = segments(v)
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(segs.map(s => dir.resolve(s.name).toString): _*)
  }

  /** Append-only commit: write `df` as one new segment, manifest = old + new.
    * Cost is proportional to the NEW rows only. When the commit chain
    * exceeds `compactThreshold`, the append folds the SMALLEST half of the
    * commits (by on-disk bytes) plus the new rows into one segment and
    * leaves the large tail untouched — size-tiered, LSM-style: big segments
    * are rewritten only once they are small relative to the table, so
    * append-heavy ingest never pays an O(table) rewrite (a flat fold-all
    * would, every `compactThreshold` appends), while scan fan-in stays
    * bounded at ~compactThreshold. */
  override def append(df: DataFrame): Unit = append(df, 32)

  def append(df: DataFrame, compactThreshold: Int): Unit = {
    val (v, segs) = currentSnapshot()
    // a bucketed commit contributes many manifest entries; fold bookkeeping
    // runs on COMMITS (top-level segment dirs), not entries, or bucketing
    // would force pathological compaction every few appends
    val topOrder = segs.map(_.name.takeWhile(_ != '/')).distinct
    if (topOrder.size < compactThreshold) commit(v, segs, df)
    else asConflict("tiered fold") {
      // sizing + reading the folded segments races a fast concurrent
      // writer's retirement of them; asConflict converts the resulting
      // missing-file errors into the documented clean retryable conflict
      val bySize = topOrder.map(top => top -> dirBytes(dir.resolve(top))).sortBy(_._2)
      val foldTops = bySize.take(topOrder.size - compactThreshold / 2).map(_._1).toSet
      val (folded, kept) = segs.partition(s => foldTops(s.name.takeWhile(_ != '/')))
      val foldedDf = spark.read.schema(schema)
        .parquet(folded.map(s => dir.resolve(s.name).toString): _*)
      commit(v, kept, foldedDf.unionByName(df))
    }
  }

  /** Convert missing-file failures from reading segments a concurrent
    * writer retired mid-operation into the clean retryable conflict the
    * multi-writer contract promises. Walks the CAUSE CHAIN: an executor-side
    * FileNotFoundException surfaces driver-side wrapped in SparkException,
    * and a bare type match would leak it as a non-retryable error.
    * Exposed ([[private[graft]]]) so read-modify-write callers — e.g.
    * AnnIndexStore.compactDeletes — can wrap their read+transform+
    * materialize bodies too: [[readWithVersion]] returns a LAZY frame
    * whose segment files a concurrent writer can retire before the
    * caller's localCheckpoint materializes them, and without this
    * conversion that race escapes their CAS retry loops as a crash. */
  private[graft] def asConflict[T](op: String)(body: => T): T =
    try body
    catch {
      case e: Throwable if causeChain(e).exists(isMissingFile) =>
        CasStats.add("read_conflict", 1)
        throw new CommitConflictException(
          s"$op on $path raced a concurrent writer's segment retirement; re-read and retry")
    }

  private def causeChain(e: Throwable): Seq[Throwable] = {
    val out = Seq.newBuilder[Throwable]
    var cur = e
    var depth = 0
    while (cur != null && depth < 16) { out += cur; cur = cur.getCause; depth += 1 }
    out.result()
  }

  private def isMissingFile(t: Throwable): Boolean = t match {
    case _: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException => true
    case a: org.apache.spark.sql.AnalysisException =>
      a.getMessage != null && (a.getMessage.contains("PATH_NOT_FOUND") ||
        a.getMessage.contains("Path does not exist"))
    case _ => false
  }

  private def dirBytes(p: java.nio.file.Path): Long =
    if (Files.isDirectory(p)) listDir(p).map(dirBytes).sum
    else if (Files.exists(p)) Files.size(p) else 0L

  /** Full-snapshot commit: write `df` as the only segment (compaction path);
    * superseded segments are retired after a one-version grace window. */
  override def publish(df: DataFrame): Unit =
    commit(currentVersion, Nil, df)

  /** Current snapshot WITH its version — for read-modify-write callers
    * that must CAS their writeback against concurrent commits (pair with
    * [[publishIfVersion]]; see AnnIndexStore.compactDeletes). */
  def readWithVersion(): (Long, DataFrame) = {
    val (v, segs) = currentSnapshot()
    val df =
      if (segs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(segs.map(s => dir.resolve(s.name).toString): _*)
    (v, df)
  }

  /** Full-snapshot commit that claims exactly version `expected`+1 —
    * throws [[CommitConflictException]] if ANY other writer committed
    * after snapshot `expected` was read (the manifest hard-link claim is
    * the CAS). This is what makes a read-modify-write sequence safe:
    * `publish` alone re-reads the version at claim time, so a concurrent
    * commit landing between the caller's read and its writeback would be
    * silently discarded (keepSegs = Nil drops the interloper's segment —
    * the r12 lost-delete finding). */
  def publishIfVersion(df: DataFrame, expected: Long): Unit =
    commit(expected, Nil, df)

  /** Rewrite the current contents into a single segment (manifest GC).
    * CAS-retried internally: compaction is pure read-modify-write, so an
    * unconditional publish would erase any commit that landed between
    * the read and the writeback — instead each attempt pins (version,
    * rows) and claims version+1, re-reading on conflict. Answer-neutral
    * by construction either way; the retry makes it LOSSLESS under
    * concurrent writers too. */
  def compact(): Unit = {
    var done = false
    while (!done) {
      var pinned: Option[DataFrame] = None
      try {
        // the read + eager checkpoint can itself race a faster writer's
        // segment retirement — asConflict folds that missing-file failure
        // into the same retryable conflict as a lost manifest claim
        val (v, df) = asConflict("compaction read") {
          val (v0, d0) = readWithVersion()
          (v0, d0.localCheckpoint())
        }
        pinned = Some(df)
        publishIfVersion(df, v)
        done = true
      } catch { case _: CommitConflictException => () }
      // release the attempt's pinned RDD blocks win or lose (a winner's
      // rows are on disk in the new segment; a loser's would otherwise
      // accumulate in executor storage across conflict retries)
      finally pinned.foreach(df =>
        try df.unpersist() catch { case _: Throwable => () })
    }
  }

  /** Remove rows whose `keyCol` is in `keys`, rewriting ONLY segments whose
    * key-range stats can contain a victim — O(touched segments), not
    * O(table). Untouched segment directories are never read or modified.
    * Stats help most when segment key ranges are narrow (time/name-ordered
    * ingest); content-hash keys span the space, so hash-keyed tables degrade
    * gracefully toward a full rewrite. */
  override def deleteKeys(keyCol: String, keys: Seq[String]): Unit = {
    if (keys.isEmpty) return
    val (v, segs) = currentSnapshot()
    // segment stats were computed over statsCol — pruning on any OTHER
    // column would silently skip segments that hold victims, so a
    // mismatched keyCol degrades to touching every segment (correct, just
    // unpruned) instead of a wrong answer
    val (touched, untouched) =
      if (statsCol.contains(keyCol)) segs.partition(s => keys.exists(s.mayContain))
      else (segs, Seq.empty[Segment])
    if (touched.isEmpty) return // no segment can hold a victim: free no-op
    asConflict("targeted delete") {
      val survivors = spark.read.schema(schema)
        .parquet(touched.map(s => dir.resolve(s.name).toString): _*)
        // !isInCollection is NULL (not true) for a null key under SQL
        // three-valued logic — keep null-key rows explicitly or they would
        // vanish along with the victims
        .filter(col(keyCol).isNull || !col(keyCol).isInCollection(keys))
      commit(v, untouched, survivors)
    }
  }

  /** Test seam: runs between the segment write and the atomic manifest
    * claim — the window where a competing writer can win or this one can
    * die. Production no-op. */
  protected def onBeforeManifestClaim(): Unit = ()

  private def commit(v: Long, keepSegs: Seq[Segment], newData: DataFrame): Unit = {
    val next = v + 1
    val attempt = java.util.UUID.randomUUID().toString.take(8)
    val segName = s"seg-$next-$attempt" // unique per attempt: racing writers never clobber
    val segPath = dir.resolve(segName)
    // stats (and emptiness) come from one narrow readback of the new files:
    // the agg prunes to the key column, so the cost is one small column scan
    // of the NEW rows only
    val newSegs: Seq[Segment] = statsCol match {
      case Some(c) if bucketed =>
        // key-range bucketing for content-hash keys: a hash key's min/max
        // spans the whole keyspace, so per-commit stats alone never let a
        // delete skip a segment. Partitioning each commit by the key's
        // leading character yields sub-segments with one-character key
        // ranges — a delete then touches only the buckets its victims hash
        // into, even on uniformly-distributed keys. The bucket NAME is the
        // hex of the leading char's UTF-8 bytes ('b' prefix keeps it
        // inference-proof): user keys may start with characters Hadoop
        // escapes in partition paths ('%', ':', '=', …), and an escaped
        // on-disk name recorded unescaped in the manifest would make every
        // later read miss the path — hex is alnum, never escaped, so disk
        // and manifest always agree. Pruning is unaffected: mayContain
        // reads the per-bucket min/max STATS, never the bucket name.
        newData
          .withColumn("__bucket", concat(lit("b"), hex(substring(col(c), 0, 1))))
          .write.mode("overwrite").partitionBy("__bucket").parquet(segPath.toString)
        val stats =
          try spark.read.parquet(segPath.toString) // partition col re-inferred
            .groupBy(col("__bucket"))
            .agg(sqlMin(col(c)).cast("string").as("lo"), sqlMax(col(c)).cast("string").as("hi"))
            .collect().toSeq
          catch { // an empty write leaves no files to infer a schema from
            case _: org.apache.spark.sql.AnalysisException => Nil
          }
        stats.map(r => Segment(s"$segName/__bucket=${r.getString(0)}",
          Option(r.getString(1)), Option(r.getString(2)))).sortBy(_.name)
      case Some(c) =>
        newData.write.mode("overwrite").parquet(segPath.toString)
        val r = spark.read.schema(schema).parquet(segPath.toString)
          .agg(count(lit(1)), sqlMin(col(c)).cast("string"), sqlMax(col(c)).cast("string"))
          .head()
        if (r.getLong(0) == 0L) Nil
        else Seq(Segment(segName, Option(r.getString(1)), Option(r.getString(2))))
      case None =>
        newData.write.mode("overwrite").parquet(segPath.toString)
        Seq(Segment(segName, None, None))
    }
    if (newSegs.isEmpty) deleteRecursively(segPath)
    val segs = keepSegs ++ newSegs
    val body = segs.map(segLine).mkString("", "\n", "\n")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".manifest-$next.tmp-$attempt")
    Files.write(tmp, body.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    onBeforeManifestClaim()
    try Files.createLink(manifestPath(next), tmp) // atomic CAS: link(2) is EEXCL
    catch {
      case _: FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        // price the loss before discarding it: these bytes were fully
        // written and will never be referenced by any manifest
        CasStats.add("claim_lost", 1)
        CasStats.add("wasted_bytes", dirBytes(segPath))
        deleteRecursively(segPath) // our own never-referenced attempt
        throw new CommitConflictException(
          s"version $next of $path was claimed by a concurrent writer; re-read and retry")
    }
    Files.deleteIfExists(tmp)
    // retire manifests strictly below the base version (one-version grace
    // window: plans resolved before this commit still execute — lazy
    // DataFrames hold segment paths and open them only at action time),
    // plus their segments referenced by neither the new nor the base
    // version. Unreferenced crash debris is left for vacuum(): deleting any
    // not-yet-claimed segment here could race an in-flight writer.
    // tolerant read: a faster writer that already committed next+1 retires
    // manifest v — this commit's claim LANDED, so a missing base manifest
    // must degrade to "nothing extra to keep", never surface as a failure
    // (the caller would retry a commit that succeeded, duplicating rows)
    val live = (segs ++ (if (v >= 0) segmentsIfExists(v) else Nil)).map(_.name).toSet
    listDir(dir).foreach { p =>
      p.getFileName.toString match {
        case ManifestName(n) if n.toLong < v =>
          val retired = segmentsIfExists(n.toLong).map(_.name).filterNot(live)
          Files.deleteIfExists(p)
          retired.foreach(deleteSegEntry)
        case _ => ()
      }
    }
  }

  /** Sweep crash debris: segment directories referenced by no retained
    * manifest and stale temp manifests. Maintenance op — run only while no
    * writer is in flight (a racing writer's fresh segment is unreferenced
    * until its claim lands). */
  override def vacuum(): Unit = {
    val v = currentVersion
    val live = (segmentsIfExists(v) ++ segmentsIfExists(v - 1)).map(_.name).toSet
    // a bucketed commit's entries are subdirs — the top-level dir is live
    // while ANY of its buckets is referenced
    def isLive(top: String) = live(top) || live.exists(_.startsWith(top + "/"))
    listDir(dir).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("seg-") && !isLive(name)) deleteRecursively(p)
      if (name.startsWith(".manifest-")) Files.deleteIfExists(p)
    }
  }

  /** Delete one manifest entry (a whole segment dir, or one bucket subdir of
    * a bucketed commit — in which case the parent goes too once only marker
    * files remain). */
  private def deleteSegEntry(name: String): Unit = {
    deleteRecursively(dir.resolve(name))
    val slash = name.indexOf('/')
    if (slash > 0) {
      val parent = dir.resolve(name.substring(0, slash))
      if (Files.isDirectory(parent) &&
          listDir(parent).forall(_.getFileName.toString.startsWith("_")))
        deleteRecursively(parent)
    }
  }

  /** Files.list with the stream closed (it leaks a directory fd otherwise). */
  private def listDir(p: java.nio.file.Path): List[java.nio.file.Path] = {
    if (!Files.isDirectory(p)) return Nil
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    graft.core.FsUtil.deleteRecursively(p)
}
