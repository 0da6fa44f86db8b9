package graft.operators

import graft.core.{Chunker, DedupeSettings}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The CDC chunker (SURVEY §2 A3) as a distributed query: chunk every
 * document's UTF-8 bytes inside a flatMap (pure function — identical keys
 * on any partitioning), then aggregate per-document and corpus-wide dedupe
 * stats. ORACLED: the MD5 window scan is SQL-expressible (DuckDB md5 +
 * recursive boundary walk — see SparkEntry.oracleSql's a3 entry), on top
 * of the property coverage in ChunkerSpec + DedupeEngineSpec.
 */
object ChunkQueries {
  import Tables._

  /** The DuckDB oracle enumerates window starts via `range(0, 8192)`
    * (SparkEntry.oracleSql's a3 entry): starts are multiples of
    * shiftCount=8 up to byte 65,528, and a window at start p exists iff
    * p + 256 < len — so the oracle is exact only for docs of at most
    * 65,792 bytes. A longer doc would SILENTLY lose late fire positions on
    * the oracle side and read as a false hash mismatch; guard here so a
    * regenerated corpus with bigger documents fails with an explicit
    * message instead (raise both constants together). */
  private val OracleMaxDocBytes = 65792

  def a3CdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = DedupeSettings(256, 2048, 8, 1)
    val docs = t(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)]
    docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      if (bytes.length > OracleMaxDocBytes)
        throw new IllegalStateException(
          s"a3_cdc_chunks: doc $id is ${bytes.length} bytes > $OracleMaxDocBytes — " +
            "the DuckDB oracle's range(0, 8192) window-start enumeration cannot " +
            "cover it; raise the oracle's range bound and OracleMaxDocBytes together")
      Chunker.chunk(bytes, s)
        .map(c => (id, c.chunkKey, c.length, c.position, c.address))
    }.toDF("doc_id", "chunk_key", "chunk_length", "chunk_position", "chunk_address")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("chunk_length").as("total_len"),
        countDistinct("chunk_key").as("n_distinct"))
      .orderBy("doc_id")
  }

  /** g2: the RANGED read (SURVEY G7 / CLI `get --offset/--length`) as a
    * distributed query — for every document, reconstruct byte range
    * [n/3, n/3 + 200) from its CDC CHUNKS alone: chunk in the scan, keep
    * only chunks overlapping the range (the pruning a chunk-level index
    * performs — the interval-containment shape of c1), slice each
    * overlapped chunk, and reassemble in position order. The oracle is
    * simply `substr(text, n/3 + 1, 200)` — the hash-match proves the
    * chunk → prune → slice → ordered-reassembly path is byte-identical
    * to reading the source, on EVERY document at once (the corpus is
    * ASCII, so char offsets are byte offsets). Emitting (doc, range) work
    * units from the scan keeps the op embarrassingly parallel; only the
    * final (doc_id, slice) rows move. */
  def g2RangedRead(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = DedupeSettings(256, 2048, 8, 1)
    val rangeLen = 200
    t(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)]
      .map { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        val off = bytes.length / 3
        val end = math.min(off + rangeLen, bytes.length)
        val sb = new java.lang.StringBuilder(rangeLen)
        // chunk-level range read: prune to overlapping chunks, slice, concat
        Chunker.chunkWithData(bytes, s).foreach { c =>
          val cs = c.ref.address.toInt // byte offset (position is the ordinal)
          val ce = cs + c.ref.length
          if (ce > off && cs < end) {
            val from = math.max(off, cs) - cs
            val until = math.min(end, ce) - cs
            sb.append(new String(c.data, from, until - from, "UTF-8"))
          }
        }
        (id, sb.toString)
      }.toDF("doc_id", "slice_text")
      .orderBy("doc_id")
  }
}
