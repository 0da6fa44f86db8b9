package graft.streaming

import graft.engine.DedupeEngine
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Continuous deduplicating ingest: pipe a STREAM of (objectKey STRING,
 * data BINARY) rows into a [[DedupeEngine]]. The reference is strictly
 * batch/request-driven (DedupeLibrary.cs write paths); this is the
 * Spark-native greenfield face — documents arriving on a stream are
 * chunked, deduplicated against everything already stored, and committed
 * incrementally.
 *
 * Semantics:
 *   - `foreachBatch` runs micro-batches SEQUENTIALLY, so the engine's
 *     single-writer commit contract holds with no extra coordination.
 *   - The sink is IDEMPOTENT: each batch left-anti-joins the engine's
 *     current objects snapshot on objectKey, so a replayed batch (restart
 *     from checkpoint, at-least-once source) re-ingests nothing and never
 *     trips the duplicate-key guard — at-least-once delivery + idempotent
 *     sink = effectively-once storage. Duplicates WITHIN one batch (an
 *     at-least-once source repeating a key before any commit) are
 *     collapsed to one exemplar too — otherwise both copies survive the
 *     snapshot anti-join, the ingest guard throws, and the identical
 *     replayed batch poisons the checkpoint permanently.
 *   - Work per batch is O(new data): chunking is a narrow flatMap inside
 *     `ingest`, and the dedupe joins are against key columns only.
 */
object DedupeStreamIngest {

  /** Start the ingest sink; caller owns the query lifecycle
    * (`processAllAvailable`/`stop` for finite replays, `awaitTermination`
    * in production). */
  def start(engine: DedupeEngine, objects: DataFrame, checkpointDir: String): StreamingQuery =
    objects.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val sp = batch.sparkSession
        import sp.implicits._
        val fresh = batch.select(col("objectKey").cast("string"), col("data"))
          .dropDuplicates("objectKey")
          .join(engine.objects.select(col("objectKey")), Seq("objectKey"), "left_anti")
          .as[(String, Array[Byte])]
        // a fully-replayed batch dedupes to nothing: skip the commit rather
        // than advancing three table versions with empty segments
        if (!fresh.isEmpty) engine.ingest(fresh)
      }
      .start()
}
