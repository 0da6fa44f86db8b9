package graft.engine

import graft.core.{Chunker, DedupeSettings}
import graft.sources.{TableStore, VersionedTable}
import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** One row per stored object (reference: src/DedupeLibrary/DedupeObject.cs:12-49).
  * `compressedLength` keeps the reference's (misnomer) semantics:
  * sum of the object's own chunk lengths == originalLength
  * (reference: DedupeLibrary.cs:233); real savings only show globally in stats.
  */
final case class ObjectRow(
    objectKey: String, originalLength: Long, compressedLength: Long,
    chunkCount: Long, createdUtc: Timestamp)

/** Object↔chunk edge with ordering — the reconstruction recipe
  * (reference: src/DedupeLibrary/DedupeObjectMap.cs:11-48). */
final case class MapRow(
    objectKey: String, chunkKey: String, chunkLength: Int,
    chunkPosition: Int, chunkAddress: Long)

/** Unique chunk payload (the reference keeps payloads behind user
  * callbacks — reference: src/DedupeLibrary/DedupeCallbacks.cs:15-58;
  * here they live in a first-class binary-column table). */
final case class PayloadRow(chunkKey: String, data: Array[Byte])

/** Chunk metadata with derived refcount (reference mutates a counter under
  * a lock — SqliteProvider.cs:463-484; Spark derives it from objmap). */
final case class ChunkInfo(chunkKey: String, length: Int, refCount: Long)

final case class ObjectMetadata(obj: ObjectRow, map: Seq[MapRow], chunks: Seq[ChunkInfo])

/** Enumeration envelope (reference: src/DedupeLibrary/EnumerationResult.cs:10-87).
  * Keyset pagination by objectKey replaces the reference's surrogate-id keyset. */
final case class ObjectListing(
    prefix: Option[String], startAfterKey: Option[String], maxResults: Int,
    objects: Seq[ObjectRow], nextStartAfterKey: Option[String]) {

  /** Fixed-width report (reference EnumerationResult.ToTabularString,
    * EnumerationResult.cs:117-145 — without its compressed-length column
    * bug, DedupeObject.cs:131). */
  def toTabularString: String = {
    val header = f"${"Key"}%-40s ${"Length"}%12s ${"Chunks"}%8s  Created"
    val rows = objects.map(o =>
      f"${o.objectKey}%-40s ${o.originalLength}%12d ${o.chunkCount}%8d  ${o.createdUtc}")
    (header +: rows).mkString("\n")
  }
}

/** Aggregate statistics (reference: src/DedupeLibrary/IndexStatistics.cs). */
final case class IndexStats(
    objectCount: Long, chunkCount: Long, logicalBytes: Long, physicalBytes: Long) {
  def ratioX: Double =
    if (logicalBytes == 0 || physicalBytes == 0) 0.0
    else logicalBytes.toDouble / physicalBytes
  def ratioPercent: Double =
    if (logicalBytes == 0 || physicalBytes == 0) 0.0
    else 100.0 * (1.0 - physicalBytes.toDouble / logicalBytes)

  /** Fixed-width report (reference IndexStatistics.ToTabularString,
    * IndexStatistics.cs:139-151). */
  def toTabularString: String =
    f"""Objects   : $objectCount%12d
       |Chunks    : $chunkCount%12d
       |Logical   : $logicalBytes%12d bytes
       |Physical  : $physicalBytes%12d bytes
       |Ratio     : $ratioX%12.2fX ($ratioPercent%.2f%%)""".stripMargin
}

/**
 * Spark-native deduplicating object store: the reference's whole API surface
 * (write / writeOrReplace / get / exists / list / stats / delete / position
 * lookup — reference: src/DedupeLibrary/DedupeLibrary.cs) re-expressed as
 * DataFrame algebra over three snapshot tables:
 *
 *   objects  (objectKey, originalLength, compressedLength, chunkCount, createdUtc)
 *   objmap   (objectKey, chunkKey, chunkLength, chunkPosition, chunkAddress)
 *   payloads (chunkKey, data BINARY)
 *
 * refCount is never stored: it is `objmap.groupBy(chunkKey).count()`, which
 * makes garbage collection a left-anti join instead of a locked counter.
 *
 * Concurrency contract: READS are always safe (immutable snapshots). WRITES
 * to one index are single-writer-at-a-time — the VersionedTable commit guard
 * makes a violation loud (`CommitConflictException`, no data loss) rather
 * than silent, matching the reference's writer locks
 * (SqliteProvider.cs:29-30). On a conflict, retry the whole ingest/delete:
 * its dedupe decisions (payload left-anti, duplicate-key checks) were
 * derived from a snapshot another writer has since advanced. Concurrent
 * ingests of DIFFERENT keys never conflict on the index tables (pure
 * appends), and the one anomaly they can produce — the same chunkKey
 * appended to payloads by both, each having passed its left-anti against
 * the same stale snapshot — is contained: every read path resolves map
 * rows through a per-chunkKey exemplar, so `get`/`getStream`/
 * `reconstructAll` return correct bytes THROUGH the duplicate window, and
 * [[repairIndex]] merely reclaims the wasted bytes afterwards.
 */
final class DedupeEngine(
    val spark: SparkSession, basePath: String,
    val settings: DedupeSettings = DedupeSettings(),
    payloadStore: Option[PayloadStore] = None,
    indexBackend: Option[(String, org.apache.spark.sql.types.StructType) => TableStore] = None,
    bucketedIndex: Boolean = false) {

  import spark.implicits._

  /** Index tables behind the [[graft.sources.TableStore]] seam (the
    * reference's DbProvider swap point, DbProvider.cs:10-155); parquet
    * VersionedTable by default, any backend by injection.
    *
    * `bucketedIndex = true` partitions each index commit by the leading
    * character of the object key — the right call when USER keys are
    * content hashes (a common pattern: callers of the reference often key
    * objects by their own digest). Hash keys span the keyspace, so flat
    * per-commit min/max stats never let a delete skip a segment; bucketing
    * restores O(touched buckets) deletes, exactly as the payload table
    * already does for chunkKey. Leave it false for name/time-ordered keys,
    * where whole-commit stats are already narrow. */
  private val newTable: (String, org.apache.spark.sql.types.StructType) => TableStore =
    indexBackend.getOrElse((p, s) => new VersionedTable(spark, p, s,
      // leading key column feeds per-segment min/max stats, making deletes
      // O(intersecting segments) (objects/objmap key on objectKey)
      statsCol = s.fieldNames.headOption.filter(Set("objectKey", "chunkKey")),
      bucketed = bucketedIndex))
  private val objectsT = newTable(s"$basePath/objects",
    implicitly[org.apache.spark.sql.Encoder[ObjectRow]].schema)
  private val objmapT = newTable(s"$basePath/objmap",
    implicitly[org.apache.spark.sql.Encoder[MapRow]].schema)
  /** Payload bytes behind the storage-strategy seam (reference keeps them
    * behind user callbacks, DedupeCallbacks.cs:15-58); parquet snapshot
    * table by default, any [[PayloadStore]] by injection. */
  private val store: PayloadStore =
    payloadStore.getOrElse(new ParquetPayloadStore(spark, s"$basePath/payloads"))

  def objects: Dataset[ObjectRow] = objectsT.read().as[ObjectRow]
  def objmap: Dataset[MapRow] = objmapT.read().as[MapRow]
  def payloads: Dataset[PayloadRow] = store.read().as[PayloadRow]

  /** ONE payload exemplar per NEW chunkKey — the dedupe-on-write pipeline
    * shared verbatim by `ingest` and `writeStream` (it used to exist
    * twice; the dedupe and sort contracts here are load-bearing, so a fix
    * applied to one copy and not the other would silently diverge the two
    * ingest paths). First occurrence wins (payloads for one key are
    * byte-identical — SHA-256 content key); the left-anti drops keys the
    * store already holds; the final sort is FREE (already hash-partitioned
    * by chunkKey from the dropDuplicates shuffle) and makes each parquet
    * row-group cover a narrow key range so point lookups prune via footer
    * stats. */
  private def newPayloadRows(chunkRows: DataFrame): DataFrame =
    chunkRows.select($"chunkKey", $"data")
      .dropDuplicates("chunkKey")
      .join(payloads.select($"chunkKey"), Seq("chunkKey"), "left_anti")
      .sortWithinPartitions("chunkKey")

  /** Derived chunk table: metadata + refcount from the map edges
    * (replaces reference's mutable dedupechunk rows, DedupeChunk.cs:11-36). */
  def chunks: Dataset[ChunkInfo] = objmap
    .groupBy($"chunkKey")
    .agg(max($"chunkLength").as("length"), count(lit(1)).as("refCount"))
    .as[ChunkInfo]

  // ---------------------------------------------------------------- ingest

  /** Store one object; rejects a duplicate key like the reference
    * (DedupeLibrary.cs:203). */
  def write(key: String, data: Array[Byte]): Unit = {
    require(key != null && key.nonEmpty, "object key required")
    require(data != null && data.nonEmpty, "data required")
    if (exists(key)) throw new IllegalArgumentException(s"object key already exists: $key")
    ingest(Seq(key -> data))
  }

  /** Upsert of a whole object (reference: DedupeLibrary.cs:301-318). */
  def writeOrReplace(key: String, data: Array[Byte]): Unit = {
    if (exists(key)) delete(key)
    write(key, data)
  }

  /**
   * Bulk distributed ingest — the scale path. Chunks each object inside a
   * flatMap (pure function, no driver round-trips), then derives all three
   * tables from the single chunked dataset:
   *   objmap += every (key, chunkKey, len, pos, addr);
   *   payloads += one exemplar payload per chunkKey not already stored
   *               (dedupe-on-write via left-anti against existing keys);
   *   objects += per-key rollup agg.
   * One wide transform + one shuffle per derived table; no per-object loop.
   */
  def ingest(batch: Seq[(String, Array[Byte])]): Unit =
    ingest(spark.createDataset(batch))

  def ingest(ds: Dataset[(String, Array[Byte])]): Unit = {
    val s = settings
    val chunked = ds.flatMap { case (key, bytes) =>
      s.chunkWithData(bytes).map(c => // profile-aware: md5-window or gear
        (key, c.ref.chunkKey, c.ref.length, c.ref.position, c.ref.address, c.data))
    }.toDF("objectKey", "chunkKey", "chunkLength", "chunkPosition", "chunkAddress", "data")
      .localCheckpoint() // chunk once; three tables derive from this

    // a key duplicated INSIDE the batch would silently interleave two
    // payloads into one object (the reference rejects duplicate keys on
    // every write); every object has exactly one position-0 chunk, so >1
    // such row per key means the batch itself collides
    val inBatchDup = chunked.filter($"chunkPosition" === 0)
      .groupBy($"objectKey").count().filter($"count" > 1).limit(1).collect()
    if (inBatchDup.nonEmpty)
      throw new IllegalArgumentException(
        s"duplicate object key within ingest batch: ${inBatchDup.head.getString(0)}")

    val existingKeys = objects.select($"objectKey")
    val dupes = chunked.select($"objectKey").distinct()
      .join(existingKeys, Seq("objectKey"), "left_semi").limit(1).collect()
    if (dupes.nonEmpty)
      throw new IllegalArgumentException(s"object key already exists: ${dupes.head.getString(0)}")

    // crash debris: a prior attempt that died between its objmap and
    // objects commits left map rows for keys now absent from objects —
    // appending over them would interleave two writes into one object.
    // Cheap probe first (narrow early-terminating key-column scan, same
    // cost class as the duplicate check above); the full purge runs only
    // in the rare after-a-crash case
    val batchKeys = chunked.select($"objectKey").distinct()
    val hasDebris = !objmap.select($"objectKey")
      .join(batchKeys, Seq("objectKey"), "left_semi").limit(1).isEmpty
    if (hasDebris) {
      val debris = objmap.select($"objectKey")
        .join(batchKeys, Seq("objectKey"), "left_semi")
        .distinct().as[String].collect()
      objmapT.deleteKeys("objectKey", debris.toSeq)
    }

    // incremental commits: each table gains ONE new segment holding only the
    // batch's rows (O(new data) — at scale an ingest never rewrites tables)
    val newMap = chunked.select($"objectKey", $"chunkKey", $"chunkLength",
      $"chunkPosition", $"chunkAddress")
    objmapT.append(newMap)

    store.append(newPayloadRows(chunked))

    val now = new Timestamp(System.currentTimeMillis())
    val newObjects = chunked.groupBy($"objectKey").agg(
      sum($"chunkLength").cast(LongType).as("originalLength"),
      sum($"chunkLength").cast(LongType).as("compressedLength"),
      count(lit(1)).as("chunkCount"))
      .withColumn("createdUtc", lit(now))
      .select($"objectKey", $"originalLength", $"compressedLength", $"chunkCount", $"createdUtc")
    objectsT.append(newObjects)
  }

  /**
   * Store one object from a stream with BOUNDED memory — the path for
   * objects beyond [[DedupeEngine.MaxObjectBytes]] (the reference likewise
   * consumes a Stream, never whole-file bytes: DedupeLibrary.cs:605-717;
   * its CLI pipes stdin, Cli/Program.cs:211-228).
   *
   * Chunks spool in ~`batchBytes` slabs into a staging parquet directory
   * under the index (plain files, NOT table commits), then the three tables
   * commit exactly ONCE each — so a 2 TB object costs 3 commits, not
   * thousands (per-slab table appends would re-trigger the segment-fold
   * compaction every 32 slabs: quadratic write amplification). The OBJECTS
   * row commits LAST, so a crash degrades to unreachable rows at worst
   * (exists = false, get = None) and usually to nothing but a staging dir
   * the next [[repairIndex]]-free retry ignores; staging is removed on both
   * success and failure.
   */
  def writeStream(key: String, in: java.io.InputStream,
      batchBytes: Long = 64L << 20): Unit = {
    require(key != null && key.nonEmpty, "object key required")
    if (exists(key)) throw new IllegalArgumentException(s"object key already exists: $key")
    purgeDebrisFor(Seq(key)) // a dead prior attempt's map rows must not merge in
    val stage = s"$basePath/.stage-${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val it = settings.chunkStream(in)
      require(it.hasNext, "data required")
      var totalLen = 0L
      var totalChunks = 0L
      val batch = scala.collection.mutable.ArrayBuffer.empty[graft.core.ChunkWithData]
      var batchSize = 0L
      def flush(): Unit = if (batch.nonEmpty) {
        spark.createDataset(batch.toSeq.map(c =>
            (key, c.ref.chunkKey, c.ref.length, c.ref.position, c.ref.address, c.data)))
          .toDF("objectKey", "chunkKey", "chunkLength", "chunkPosition", "chunkAddress", "data")
          .write.mode("append").parquet(stage)
        batch.clear()
        batchSize = 0L
      }
      while (it.hasNext) {
        val c = it.next()
        totalLen += c.ref.length
        totalChunks += 1
        batch += c
        batchSize += c.ref.length
        if (batchSize >= batchBytes) flush()
      }
      flush()
      val staged = spark.read.parquet(stage)
      objmapT.append(staged.select($"objectKey", $"chunkKey", $"chunkLength",
        $"chunkPosition", $"chunkAddress"))
      store.append(newPayloadRows(staged))
      val now = new Timestamp(System.currentTimeMillis())
      objectsT.append(spark.createDataset(Seq(
        ObjectRow(key, totalLen, totalLen, totalChunks, now))).toDF())
    } finally {
      graft.core.FsUtil.deleteRecursively(java.nio.file.Paths.get(stage))
    }
  }

  /** Remove crash-debris map rows for keys about to be (re)written: a prior
    * attempt that died between its objmap commit and its objects commit left
    * rows that would silently merge with the new write's map. Cheap when
    * clean — one point-filtered existence probe, no table rewrite. */
  private def purgeDebrisFor(keys: Seq[String]): Unit = {
    val debris = objmap.filter($"objectKey".isInCollection(keys))
      .select($"objectKey").distinct().as[String].collect()
    if (debris.nonEmpty) objmapT.deleteKeys("objectKey", debris.toSeq)
  }

  /** Ingest every file under `path` (recursively) as one object each,
    * through Spark's binaryFile source — the distributed analog of the
    * reference sample apps' file-per-object storage
    * (reference: src/Test/Program.cs:184-207). Keys are paths RELATIVE to
    * the source root, not basenames: same-named files in different
    * subdirectories must stay distinct objects, not collide in one key.
    * binaryFile materializes each file as ONE row, so files beyond
    * `maxObjectBytes` (JVM array bound by default) are rejected loudly
    * up front — from a status-only scan, before any payload bytes move —
    * with a pointer to the [[writeStream] ] path that handles them. */
  def ingestDirectory(path: String,
      maxObjectBytes: Long = DedupeEngine.MaxObjectBytes): Unit = {
    val root = java.nio.file.Paths.get(path).toAbsolutePath.normalize.toString
    val oversized = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(path)
      .select($"path", $"length") // file-status columns only: no content read
      .filter($"length" > maxObjectBytes)
      .limit(3).collect()
    if (oversized.nonEmpty)
      throw new IllegalArgumentException(
        s"file(s) exceed the $maxObjectBytes-byte single-row ingest bound: " +
          oversized.map(r => s"${r.getString(0)} (${r.getLong(1)} B)").mkString(", ") +
          " ...; ingest oversized objects individually via writeStream")
    val files = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true").load(path)
      .select($"path", $"content")
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        // binaryFile reports Hadoop-style paths (file:/...) whose path part
        // is already DECODED — a space or literal '%' appears raw, so
        // java.net.URI would reject ('a b.bin') or mis-decode ('p%25q.bin')
        // them. hadoop.fs.Path round-trips both. Fail loudly on a path
        // outside the root — a silent basename fallback would reintroduce
        // same-name collisions across subdirs
        val local = new org.apache.hadoop.fs.Path(p).toUri.getPath
        if (!local.startsWith(root + "/"))
          throw new IllegalStateException(
            s"binaryFile path '$p' (decoded '$local') is not under ingest root '$root'")
        (local.substring(root.length + 1), bytes)
      }
    ingest(files)
  }

  /** Reconstruct objects and write each as a file named by its key under
    * `outDir` — the distributed Get→file sink (executor-side writes; no
    * driver materialization). Keys containing '/' become subdirectories;
    * an empty index exports 0 files. */
  def exportAll(outDir: String, keys: Option[Seq[String]] = None): Long = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val outRootStr = java.nio.file.Paths.get(outDir).toAbsolutePath.normalize.toString
    val counts = reconstructAll(keys).map { case (key, bytes) =>
      // object keys are untrusted: a '..' segment must not escape outDir
      val outRoot = java.nio.file.Paths.get(outRootStr)
      val target = outRoot.resolve(key).normalize
      require(target.startsWith(outRoot),
        s"object key escapes the export directory: $key")
      val parent = target.getParent
      if (parent != null) java.nio.file.Files.createDirectories(parent)
      java.nio.file.Files.write(target, bytes)
      1L
    }
    counts.toDF("n").agg(coalesce(sum($"n"), lit(0L))).as[Long].head()
  }

  // ---------------------------------------------------------------- lookups

  /** Equality existence probe (reference: DedupeLibrary.cs:562-566). */
  def exists(key: String): Boolean =
    !objects.filter($"objectKey" === key).limit(1).isEmpty

  /** Point metadata lookup enriched with ordered map + chunk info
    * (reference: SqliteProvider.cs:282-305). Exactly TWO Spark jobs — the
    * point-read latency contract `openStream` set: job 1 collects the object
    * row AND its map rows in one union scan; job 2 computes the global
    * refcounts for just this object's chunk keys (an IN filter pushed under
    * the objmap agg — refcounts are cross-object, so they need their own
    * pass). Never a job per table, never a broadcast build job. */
  def getMetadata(key: String): Option[ObjectMetadata] = {
    val o = objects.filter($"objectKey" === key)
      .select(lit("o").as("kind"), $"objectKey", $"originalLength",
        $"compressedLength", $"chunkCount", $"createdUtc",
        lit(null).cast(StringType).as("chunkKey"),
        lit(null).cast(IntegerType).as("chunkLength"),
        lit(null).cast(IntegerType).as("chunkPosition"),
        lit(null).cast(LongType).as("chunkAddress"))
    val m = objmap.filter($"objectKey" === key)
      .select(lit("m").as("kind"), $"objectKey",
        lit(null).cast(LongType).as("originalLength"),
        lit(null).cast(LongType).as("compressedLength"),
        lit(null).cast(LongType).as("chunkCount"),
        lit(null).cast(TimestampType).as("createdUtc"),
        $"chunkKey", $"chunkLength", $"chunkPosition", $"chunkAddress")
    val rows = o.unionByName(m).collect() // job 1
    val objRow = rows.find(_.getString(0) == "o").map(r => ObjectRow(
      r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getTimestamp(5)))
    objRow.map { obj =>
      val mapRows = rows.iterator.filter(_.getString(0) == "m").map(r => MapRow(
        r.getString(1), r.getString(6), r.getInt(7), r.getInt(8), r.getLong(9)))
        .toSeq.sortBy(_.chunkAddress)
      val keys = mapRows.map(_.chunkKey).distinct
      // job 2: one shuffle-free filtered scan of the map edges touching this
      // object's chunks, aggregated driver-side (a groupBy would be correct
      // but AQE runs its shuffle as an extra job; collected rows = sum of
      // these chunks' refcounts — point-lookup sized by construction)
      val refs = objmap.filter($"chunkKey".isInCollection(keys))
        .select($"chunkKey", $"chunkLength").as[(String, Int)].collect()
      val ck = refs.groupBy(_._1).map { case (k, rs) =>
        ChunkInfo(k, rs.head._2, rs.length.toLong)
      }.toSeq
      ObjectMetadata(obj, mapRows, ck)
    }
  }

  /** Chunk metadata point lookup (reference: SqliteProvider.cs:312-326). */
  def getChunkMetadata(chunkKey: String): Option[ChunkInfo] =
    chunks.filter($"chunkKey" === chunkKey).limit(1).collect().headOption

  /** The map entry covering byte position `pos` of an object — interval
    * containment, the reference's only raw-SQL query
    * (reference: SqliteProvider.cs:363-393). */
  def mapForPosition(key: String, pos: Long): Option[MapRow] =
    objmap.filter($"objectKey" === key &&
        $"chunkAddress" <= pos && $"chunkAddress" + $"chunkLength" > pos)
      .limit(1).collect().headOption

  /** Dedupe-aware object clone — copy an object WITHOUT touching a single
    * payload byte: the CAS benefit the reference's content-keyed design
    * implies but never ships as a verb. The destination gets the source's
    * map rows re-keyed plus a fresh objects row; every shared chunk's
    * refcount rises by construction (refcounts are DERIVED from objmap,
    * so there is no counter to race on). Cost is O(source chunk count)
    * index appends and ZERO payload I/O — cloning a 1 TB object moves
    * kilobytes of index. Source and clone then share chunks exactly like
    * two independently-written identical objects: deleting either leaves
    * the other fully readable (F1's anti-join GC sees the survivor's
    * references). */
  def cloneObject(srcKey: String, dstKey: String): Unit = {
    require(dstKey != null && dstKey.nonEmpty, "object key required")
    if (!exists(srcKey)) throw new NoSuchElementException(s"no such object: $srcKey")
    if (exists(dstKey)) throw new IllegalArgumentException(s"object key already exists: $dstKey")
    purgeDebrisFor(Seq(dstKey))
    objmapT.append(objmap.filter($"objectKey" === srcKey).toDF()
      .withColumn("objectKey", lit(dstKey))
      .select($"objectKey", $"chunkKey", $"chunkLength", $"chunkPosition", $"chunkAddress"))
    objectsT.append(objects.filter($"objectKey" === srcKey).toDF()
      .withColumn("objectKey", lit(dstKey))
      .withColumn("createdUtc", lit(new Timestamp(System.currentTimeMillis())))
      .select($"objectKey", $"originalLength", $"compressedLength", $"chunkCount", $"createdUtc"))
  }

  // ---------------------------------------------------------------- read

  /** Reconstruct an object: filter map → join payloads → order → concat
    * (reference: DedupeLibrary.cs:377-404). */
  def get(key: String): Option[Array[Byte]] = {
    if (!exists(key)) return None
    val parts = objmap.filter($"objectKey" === key)
      .join(payloads, Seq("chunkKey"))
      .select($"chunkAddress", $"data")
      // out-of-contract concurrent ingests can leave the SAME chunkKey at
      // two payload versions (both passed their left-anti against one stale
      // snapshot); each map row must then resolve to ONE exemplar or the
      // join doubles the chunk. chunkAddress is unique per object (the
      // tiling invariant), and payloads for one key are byte-identical
      // (SHA-256 content keys), so any survivor is correct. Post-join on
      // the point path: dedupes this object's few rows — never forces an
      // exchange of the whole payload table the way a pre-join
      // dropDuplicates("chunkKey") would here.
      .dropDuplicates("chunkAddress")
      .orderBy($"chunkAddress")
      .collect()
    val out = new java.io.ByteArrayOutputStream()
    parts.foreach(r => out.write(r.getAs[Array[Byte]]("data")))
    Some(out.toByteArray)
  }

  /** Chunk-at-a-time read (reference DedupeStream, DedupeStream.cs:13-175):
    * an iterator over address-ordered chunks. All of the object's payloads
    * are prefetched in ONE batched pass (a point-read API must not run one
    * Spark job per chunk — a 100-chunk object would launch 100 query
    * executions); objects are at most a few thousand chunks by construction,
    * so the prefetch is the same memory envelope as `get`. */
  def getStream(key: String): Option[Iterator[Array[Byte]]] =
    committedMap(key).filter(_.nonEmpty).map { ms =>
      val m = ms.sortBy(_.chunkAddress).map(_.chunkKey)
      val prefetched = store.fetch(m.distinct) // ONE pass for all chunks
      m.iterator.map(prefetched(_))
    }

  /** The object's map rows IFF its objects-table row is committed — ONE
    * union scan (getMetadata's shape), preserving the point-read job
    * budget. This is the crash-debris guard the contract doc promises:
    * a writeStream that died between its objmap and objects commits must
    * be invisible to EVERY read path, and an objmap-only read here would
    * instead return Some(...) for a key where exists=false/get=None —
    * worse, its iterator would throw when the never-committed payloads
    * are missing from the prefetch. */
  private def committedMap(key: String): Option[Seq[MapRow]] = {
    val rows = objects.filter($"objectKey" === key)
      .select(lit("o").as("kind"), lit(null).cast(StringType).as("chunkKey"),
        lit(0).as("chunkLength"), lit(0).as("chunkPosition"),
        lit(0L).as("chunkAddress"))
      .unionByName(objmap.filter($"objectKey" === key)
        .select(lit("m").as("kind"), $"chunkKey", $"chunkLength",
          $"chunkPosition", $"chunkAddress"))
      .collect()
    if (!rows.exists(_.getString(0) == "o")) None
    else Some(rows.toSeq.filter(_.getString(0) == "m").map(r =>
      MapRow(key, r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4))))
  }

  /** Seekable java.io.InputStream over a deduped object (the reference's
    * DedupeStream facade) — each refill resolves the covering chunk via the
    * position lookup (C1) and copies the overlap. Opening costs exactly two
    * Spark jobs (map collect + batched payload prefetch — never one job per
    * chunk); reads and seeks after open touch no Spark at all. Diverges
    * deliberately from two reference bugs (SURVEY §7): reads past EOF return
    * -1 (not a buffer-offset bail, DedupeStream.cs:89) and seeking to any
    * position in [0, length] is allowed (DedupeStream.cs:125 rejects
    * offset == Length).
    */
  def openStream(key: String): Option[DedupeObjectStream] =
    committedMap(key).filter(_.nonEmpty).map { m =>
      val length = m.iterator.map(r => r.chunkAddress + r.chunkLength).max
      val prefetched = store.fetch(m.map(_.chunkKey).distinct)
      new DedupeObjectStream(length, m.sortBy(_.chunkAddress),
        ck => prefetched.getOrElse(ck, store.fetch(Seq(ck))(ck)))
    }

  /** Distributed bulk reconstruction — every object (or a filtered set)
    * rebuilt in one job via the ordered binary-concat aggregator: map rows
    * join payloads on chunkKey, group by object, concat by address. No
    * driver loop, no per-object query; the 100 TB path. */
  def reconstructAll(keys: Option[Seq[String]] = None): Dataset[(String, Array[Byte])] = {
    // debris guard: only map rows whose OBJECT row committed participate —
    // a writeStream that died between its objmap and objects commits (or a
    // delete that died between objects and objmap) must not surface as a
    // phantom/truncated/resurrected object in a bulk export. The semi-join
    // build side is the objects table (object-count rows, far below the
    // map's chunk-count rows) — AQE broadcasts it in the common case.
    val committed = objmap.toDF()
      .join(objects.select($"objectKey"), Seq("objectKey"), "left_semi")
    val m = keys.fold(committed)(ks =>
      committed.join(spark.createDataset(ks).toDF("objectKey"), Seq("objectKey"), "left_semi"))
    // exemplar view: concurrent-ingest races can duplicate a chunkKey across
    // payload versions; deduping the payload side BEFORE the join costs no
    // extra shuffle — the dedupe's exchange+sort on chunkKey is exactly the
    // distribution the sort-merge join requires, so Catalyst reuses it —
    // and it shrinks the join's build input besides
    m.join(payloads.dropDuplicates("chunkKey"), Seq("chunkKey"))
      .select($"objectKey", $"chunkAddress", $"data")
      .as[(String, Long, Array[Byte])]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(graft.functions.BinaryConcatAgg.toColumn.name("obj"))
  }

  // ---------------------------------------------------------------- list

  /** Prefix-filtered keyset-paginated enumeration
    * (reference: SqliteProvider.cs:203-247; page cap 100 at l.206). */
  def listObjects(prefix: Option[String] = None, startAfterKey: Option[String] = None,
      maxResults: Int = 100): ObjectListing = {
    val cap = math.min(math.max(maxResults, 1), 100)
    var df = objects.toDF()
    prefix.foreach(p => df = df.filter($"objectKey".startsWith(p)))
    startAfterKey.foreach(k => df = df.filter($"objectKey" > k))
    val page = df.orderBy($"objectKey").limit(cap).as[ObjectRow].collect().toSeq
    val next = if (page.size == cap) Some(page.last.objectKey) else None
    ObjectListing(prefix, startAfterKey, cap, page, next)
  }

  // ---------------------------------------------------------------- stats

  /** Index statistics in two single-pass aggregations
    * (reference: SqliteProvider.cs:155-190). */
  def indexStats(): IndexStats = {
    val o = objects.agg(count(lit(1)), coalesce(sum($"originalLength"), lit(0L)))
      .as[(Long, Long)].head()
    val c = chunks.agg(count(lit(1)), coalesce(sum($"length".cast(LongType)), lit(0L)))
      .as[(Long, Long)].head()
    IndexStats(o._1, c._1, o._2, c._2)
  }

  // ---------------------------------------------------------------- delete

  /** Delete an object; orphaned chunks (refcount would hit zero) are
    * garbage-collected via left-anti join against the surviving map
    * (reference: SqliteProvider.cs:495-526 + callback fan-out
    * DedupeLibrary.cs:507-522). Returns the GC'd chunk keys. */
  def delete(key: String): Seq[String] = {
    if (!exists(key)) throw new NoSuchElementException(s"object not found: $key")
    val remainingMap = objmap.filter($"objectKey" =!= key)
    val gc = objmap.filter($"objectKey" === key).select($"chunkKey").distinct()
      .join(remainingMap.select($"chunkKey").distinct(), Seq("chunkKey"), "left_anti")
      .as[String].collect().toSeq
    // commit order matters (the three commits are not one transaction —
    // the reference wraps these in one SQLite tx, SqliteProvider.cs:495):
    // retire the OBJECTS row first, so a crash mid-delete degrades to
    // orphaned-but-unreachable map/payload rows (exists=false, get=None,
    // list hides it) instead of a live key whose get() returns empty bytes.
    // deleteKeys rewrites only segments whose key range covers the victim —
    // O(touched segments), never a full-table republish
    objectsT.deleteKeys("objectKey", Seq(key))
    objmapT.deleteKeys("objectKey", Seq(key))
    // deleting an object whose chunks are all still shared must not pay a
    // full payload-table rewrite for a no-op
    if (gc.nonEmpty) store.delete(gc)
    gc
  }

  /** Run `body` with the documented conflict-retry loop: on
    * [[graft.sources.CommitConflictException]] the whole operation re-runs
    * against a fresh snapshot (its dedupe decisions were derived from a
    * snapshot another writer has since advanced — re-reading is the fix,
    * not resuming), with jittered linear backoff so N contending writers
    * don't re-collide in lockstep. Use around `write`/`ingest`/`delete`
    * when multiple writers share one index:
    * {{{ engine.retryOnConflict() { engine.ingest(batch) } }}} */
  def retryOnConflict[T](maxAttempts: Int = 8)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: graft.sources.CommitConflictException =>
          attempt += 1
          if (attempt >= maxAttempts)
            throw new IllegalStateException(
              s"operation kept conflicting after $maxAttempts attempts", e)
          Thread.sleep(attempt * 20L + scala.util.Random.nextInt(40))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** LSM "major compaction" for the whole index: rewrite each table as one
    * globally key-SORTED snapshot. Appends leave a chain of segments (the
    * tiered fold bounds fan-in but never fully merges) whose key ranges
    * overlap — after enough churn every delete touches most segments. A
    * sorted single-snapshot commit gives each output file a disjoint key
    * range, so segment stats and parquet row-group footers prune maximally
    * again. O(table) by design; a rare, explicit maintenance op (CLI:
    * `compact`), run with no writer in flight — same contract as
    * [[repairIndex]]. The sort is one range-partitioned shuffle per table;
    * at 100 TB you run it per-partition/incrementally via the same
    * publish seam. */
  def compactIndex(): Unit = {
    // each backend decides what compaction MEANS: snapshot tables re-sort
    // into one segment; the JDBC backend is a documented no-op (the DB has
    // no snapshot fragmentation, and its objmap is corpus-proportional —
    // it must never round-trip through a driver-side publish)
    objectsT.compactSorted(Seq("objectKey"))
    objmapT.compactSorted(Seq("objectKey", "chunkPosition"))
    store.compact()
  }

  /** Sweep storage debris no snapshot references — segment directories a
    * crashed writer wrote but never claimed, stale temp manifests. Commits
    * already retire superseded segments as they go; vacuum only reclaims
    * what a crash orphaned. Run with no writer in flight (an in-flight
    * writer's fresh segment is unreferenced until its claim lands). CLI:
    * `vacuum`. */
  def vacuumIndex(): Unit = {
    objectsT.vacuum()
    objmapT.vacuum()
    store.vacuum()
  }

  /** Reclaim unreachable crash debris: map rows whose objects row never
    * committed (a `writeStream` died mid-spool) and payload rows no
    * surviving map row references (either crash, or a `delete` that died
    * between its index commits and its GC). The commit ORDER makes that
    * debris invisible to reads — objects row lands last on ingest and
    * first on delete — so those steps only reclaim space and re-tighten
    * derived stats. Repair ALSO heals duplicate payload rows (the
    * out-of-contract concurrent-append race). Reads were already correct
    * through the duplicate window — every read path resolves map rows
    * through a per-chunkKey exemplar (see [[get]]/[[reconstructAll]]) —
    * so healing reclaims the duplicated bytes, nothing more. Sweeps `.stage-*`
    * directories a killed writeStream left behind. Run it with no writer
    * in flight — an in-flight writeStream's staging dir must not be
    * swept. */
  def repairIndex(): RepairReport = {
    val orphanObjs = objmap.select($"objectKey").distinct()
      .join(objects.select($"objectKey"), Seq("objectKey"), "left_anti")
      .as[String].collect().toSeq
    if (orphanObjs.nonEmpty) objmapT.deleteKeys("objectKey", orphanObjs)
    // computed AFTER the map cleanup so chunks the debris alone referenced
    // are reclaimed in the same pass; distinct on the payload side because
    // a duplicated-and-orphaned key must be deleted (and reported) once
    val orphanChunks = payloads.select($"chunkKey").distinct()
      .join(objmap.select($"chunkKey").distinct(), Seq("chunkKey"), "left_anti")
      .as[String].collect().toSeq
    if (orphanChunks.nonEmpty) store.delete(orphanChunks)
    // duplicate payload rows: detection and healing live behind the store
    // seam (the flat-file store skips even the scan — one file per key)
    val healed = store.healDuplicates()
    // staging dirs a killed writeStream never cleaned (its finally block
    // died with it) — can hold up to the whole object's spooled bytes and
    // no table-level vacuum ever sees them
    val base = java.nio.file.Paths.get(basePath)
    if (java.nio.file.Files.isDirectory(base)) {
      val s = java.nio.file.Files.list(base)
      try s.iterator().asScala
        .filter(_.getFileName.toString.startsWith(".stage-"))
        .foreach(graft.core.FsUtil.deleteRecursively)
      finally s.close()
    }
    RepairReport(orphanObjs, orphanChunks, healed)
  }
}

/** What [[DedupeEngine.repairIndex]] reclaimed and healed. */
final case class RepairReport(
    orphanObjects: Seq[String], orphanChunks: Seq[String],
    healedDuplicates: Seq[String])

/** Index lifecycle + config persistence (reference A7: InitializeIndex /
  * IsInitialized / config upsert-lookup, SqliteProvider.cs:65-149,
  * DedupeLibrary.cs:583-603 — chunking params live with the index so every
  * later open chunks identically). */
object DedupeEngine {

  /** Hard byte bound of the array-based ingest paths: `write`/`ingest`/
    * `ingestDirectory` hold one `Array[Byte]` per object (JVM arrays cap
    * near 2^31). Objects beyond it must go through [[DedupeEngine.writeStream]]. */
  val MaxObjectBytes: Long = Int.MaxValue.toLong - 64

  private def configPath(basePath: String) =
    java.nio.file.Paths.get(basePath, "config.properties")

  def isInitialized(basePath: String): Boolean =
    java.nio.file.Files.exists(configPath(basePath))

  /** Create a new index directory, persisting the chunking params and the
    * index storage layout. Pass `bucketedIndex = true` when user object
    * keys are content hashes — the layout choice lives with the index, so
    * every later [[open]] commits with the same bucketing. Pass
    * `jdbcIndex = true` to keep the index tables in an embedded relational
    * DB under the index directory instead of parquet snapshots (the
    * reference persists its provider choice the same way — the database
    * file IS the config; src/Test.External swaps it for MySQL): the choice
    * is recorded in config.properties, so every later [[open]] wires the
    * same backend. */
  def create(spark: SparkSession, basePath: String,
      settings: DedupeSettings = DedupeSettings(),
      bucketedIndex: Boolean = false,
      jdbcIndex: Boolean = false): DedupeEngine = {
    require(!isInitialized(basePath), s"index already initialized: $basePath")
    require(!(bucketedIndex && jdbcIndex),
      "bucketed_index is a parquet-layout option; the JDBC index has no segment files to bucket")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(basePath))
    val body = (settings.toConfigMap
      + ("bucketed_index" -> bucketedIndex.toString)
      + ("jdbc_index" -> jdbcIndex.toString))
      .toSeq.sorted
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n")
    java.nio.file.Files.write(configPath(basePath), body.getBytes("UTF-8"))
    new DedupeEngine(spark, basePath, settings,
      indexBackend = jdbcBackendIf(jdbcIndex, spark, basePath),
      bucketedIndex = bucketedIndex)
  }

  /** Open an existing index with its persisted chunking params and layout. */
  def open(spark: SparkSession, basePath: String): DedupeEngine = {
    require(isInitialized(basePath), s"index not initialized: $basePath (create first)")
    val m = new String(java.nio.file.Files.readAllBytes(configPath(basePath)), "UTF-8")
      .linesIterator.filter(_.contains("=")).map { l =>
        val Array(k, v) = l.split("=", 2); k.trim -> v.trim
      }.toMap
    new DedupeEngine(spark, basePath, DedupeSettings.fromConfigMap(m),
      indexBackend = jdbcBackendIf(m.get("jdbc_index").contains("true"), spark, basePath),
      bucketedIndex = m.get("bucketed_index").contains("true"))
  }

  private def jdbcBackendIf(on: Boolean, spark: SparkSession, basePath: String) =
    if (on) Some(graft.sources.JdbcTableStore.factory(spark, s"$basePath/derby-index"))
    else None
}
