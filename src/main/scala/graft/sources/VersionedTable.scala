package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

/**
 * Minimal atomic snapshot table over Parquet.
 *
 * The reference mutates SQLite rows in place under locks
 * (reference: src/DedupeLibrary/Database/SqliteProvider.cs:29-30).
 * On a distributed filesystem the idiomatic equivalent is
 * write-then-publish: every mutation writes a complete new snapshot
 * directory `v=N` and then atomically flips a `_CURRENT` pointer file.
 * Readers resolve the pointer once and read an immutable directory, so
 * concurrent reads never observe a torn write — the same commit-protocol
 * shape Delta Lake / Iceberg use, reduced to a single-writer engine.
 *
 * At 100 TB you would swap this for Delta (MERGE/OPTIMIZE); the engine
 * only touches this class through read()/publish(), so that swap is
 * confined here.
 */
final class VersionedTable(spark: SparkSession, path: String, schema: StructType) {

  private val dir = Paths.get(path)
  private val pointer = dir.resolve("_CURRENT")

  private def currentVersion: Long =
    if (Files.exists(pointer)) new String(Files.readAllBytes(pointer), "UTF-8").trim.toLong
    else -1L

  /** Current snapshot as a DataFrame; empty (with schema) before first publish. */
  def read(): DataFrame = {
    val v = currentVersion
    if (v < 0) spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dir.resolve(s"v=$v").toString)
  }

  /** Write a full new snapshot and atomically flip the pointer. */
  def publish(df: DataFrame): Unit = {
    val next = currentVersion + 1
    val target = dir.resolve(s"v=$next")
    df.write.mode("overwrite").parquet(target.toString)
    val tmp = dir.resolve(s"_CURRENT.tmp$next")
    Files.createDirectories(dir)
    Files.write(tmp, next.toString.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    Files.move(tmp, pointer, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    // retire superseded snapshots (single-writer: no concurrent readers mid-GC locally)
    var old = next - 2
    while (old >= 0 && Files.exists(dir.resolve(s"v=$old"))) {
      deleteRecursively(dir.resolve(s"v=$old")); old -= 1
    }
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p))
      Files.list(p).forEach(c => deleteRecursively(c))
    Files.deleteIfExists(p)
  }
}
