package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}
import scala.jdk.CollectionConverters._

/**
 * Minimal atomic snapshot table over Parquet with incremental appends.
 *
 * The reference mutates SQLite rows in place under locks
 * (reference: src/DedupeLibrary/Database/SqliteProvider.cs:29-30).
 * On a distributed filesystem the idiomatic equivalent is
 * write-then-publish: every mutation writes immutable data and then
 * atomically flips a `_CURRENT` pointer to a manifest. Readers resolve the
 * pointer once and read immutable directories, so concurrent reads never
 * observe a torn write — the same commit-protocol shape Delta Lake /
 * Iceberg use, reduced to a single-writer engine.
 *
 * A version is a MANIFEST (list of segment directories), not a single data
 * directory, so:
 *   - `append(df)`  writes ONLY the new rows as a fresh segment and commits
 *     a manifest of old-segments + new — O(new data), the ingest path; at
 *     100 TB appending a batch never rewrites the table;
 *   - `publish(df)` writes a full single-segment snapshot — the
 *     delete/compaction path (O(table), rare by design).
 *
 * At 100 TB you would swap this for Delta (MERGE/OPTIMIZE); the engine only
 * touches this class through read()/append()/publish(), so that swap is
 * confined here.
 */
final class VersionedTable(spark: SparkSession, path: String, schema: StructType)
    extends TableStore {

  private val dir = Paths.get(path)
  private val pointer = dir.resolve("_CURRENT")

  private def currentVersion: Long =
    if (Files.exists(pointer)) new String(Files.readAllBytes(pointer), "UTF-8").trim.toLong
    else -1L

  private def manifestPath(v: Long) = dir.resolve(s"manifest-$v.txt")

  /** Segment dir names referenced by version `v` (oldest first). */
  private def segments(v: Long): Seq[String] =
    if (v < 0) Nil
    else new String(Files.readAllBytes(manifestPath(v)), "UTF-8")
      .linesIterator.map(_.trim).filter(_.nonEmpty).toSeq

  /** Current snapshot as a DataFrame; empty (with schema) before first commit. */
  override def read(): DataFrame = {
    val segs = segments(currentVersion)
    if (segs.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(segs.map(s => dir.resolve(s).toString): _*)
  }

  /** Number of segments in the current version (compaction signal). */
  def segmentCount: Int = segments(currentVersion).size

  /** Append-only commit: write `df` as one new segment, manifest = old + new.
    * Cost is proportional to the NEW rows only. When the segment chain
    * exceeds `compactThreshold`, the append folds everything into one
    * segment instead (amortized O(new); keeps scan fan-in bounded). */
  override def append(df: DataFrame): Unit = append(df, 32)

  def append(df: DataFrame, compactThreshold: Int): Unit = {
    val v = currentVersion
    val segs = segments(v)
    if (segs.size >= compactThreshold) publish(read().unionByName(df))
    else commit(v, segs, df)
  }

  /** Full-snapshot commit: write `df` as the only segment (compaction /
    * delete path); superseded segments are retired after the flip. */
  override def publish(df: DataFrame): Unit =
    commit(currentVersion, Nil, df)

  /** Rewrite the current contents into a single segment (manifest GC). */
  def compact(): Unit = publish(read())

  private def commit(v: Long, keepSegs: Seq[String], newData: DataFrame): Unit = {
    val next = v + 1
    val segName = s"seg-$next"
    newData.write.mode("overwrite").parquet(dir.resolve(segName).toString)
    val manifest = (keepSegs :+ segName).mkString("", "\n", "\n")
    Files.createDirectories(dir)
    Files.write(manifestPath(next), manifest.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    val tmp = dir.resolve(s"_CURRENT.tmp$next")
    Files.write(tmp, next.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retire directories referenced by neither the new NOR the immediately
    // previous version: a one-version grace window so DataFrames resolved
    // from read() before this commit still execute (lazy plans hold segment
    // paths and only open them at action time)
    val live = keepSegs.toSet + segName ++ (if (v >= 0) segments(v).toSet else Set.empty)
    listDir(dir).foreach { p =>
      val name = p.getFileName.toString
      if (name.startsWith("seg-") && !live(name)) deleteRecursively(p)
      if (name.startsWith("manifest-") && name != s"manifest-$next.txt" &&
          name != s"manifest-$v.txt")
        Files.deleteIfExists(p)
    }
  }

  /** Files.list with the stream closed (it leaks a directory fd otherwise). */
  private def listDir(p: java.nio.file.Path): List[java.nio.file.Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) listDir(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
