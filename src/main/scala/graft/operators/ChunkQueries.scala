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
}
