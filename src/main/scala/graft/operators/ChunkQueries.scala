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

  def a3CdcChunks(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val s = DedupeSettings(256, 2048, 8, 1)
    val docs = t(spark, dir, "documents").select("doc_id", "text")
      .as[(Long, String)]
    docs.flatMap { case (id, text) =>
      Chunker.chunk(text.getBytes("UTF-8"), s)
        .map(c => (id, c.chunkKey, c.length, c.position, c.address))
    }.toDF("doc_id", "chunk_key", "chunk_length", "chunk_position", "chunk_address")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum("chunk_length").as("total_len"),
        countDistinct("chunk_key").as("n_distinct"))
      .orderBy("doc_id")
  }
}
