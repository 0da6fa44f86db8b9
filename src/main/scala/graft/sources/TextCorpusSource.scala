package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * JSONL ingest/export for the documents corpus — the interchange format
 * crawl pipelines actually deliver (one JSON object per line), next to the
 * parquet the engine prefers. Design points for the 100 TB ingest job:
 *
 *   - EXPLICIT schema, never inference: `spark.read.json` without a schema
 *     runs a whole extra corpus pass just to guess types, and a single
 *     malformed line can flip a column to string for the entire load.
 *   - PERMISSIVE + quarantine, never fail-fast: at corpus scale some lines
 *     WILL be torn (truncated shard, stray log line, encoding accident).
 *     A mode=FAILFAST load dies at hour N; DROPMALFORMED silently loses
 *     data. Instead every unparseable line lands in a `_corrupt_record`
 *     column and [[JsonlCorpus.read]] splits the load into the typed
 *     `good` frame and a `corrupt` frame carrying the raw line — the
 *     quarantine table an ingest run files for reprocessing, with counts
 *     that reconcile: good + corrupt = input lines.
 *   - JSONL is line-splittable, so the read parallelizes like any text
 *     source (maxPartitionBytes-sized splits), and the writer emits plain
 *     `text` lines so any downstream tool can consume them.
 *
 * Null-safety contract: a structurally-valid JSON line with missing or
 * null required fields is NOT "good data with nulls" — it is quarantined
 * too (`good` keeps rows with doc_id AND text present), because a null
 * doc_id would corrupt every downstream join silently.
 */
object TextCorpusSource {

  /** The canonical documents schema (matches documents.parquet), plus the
    * quarantine column the permissive parser fills for torn lines. */
  val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("_corrupt_record", StringType)))

  /** A quarantined JSONL load: `good` is the typed corpus slice, `corrupt`
    * the raw unparseable/null-key lines for the reprocess queue.
    * `release()` drops the shared-scan cache (no-op on uncached loads) —
    * call it once both frames are materialized. */
  final case class JsonlCorpus(good: DataFrame, corrupt: DataFrame,
      release: () => Unit = () => ())

  /** Read a JSONL documents corpus with the explicit schema and the
    * permissive quarantine split. One pass; no inference scan.
    *
    * Reads the files as TEXT and parses with `from_json` (same Jackson
    * parser, same splittable scan) rather than `spark.read.json`: the
    * json source only fills `_corrupt_record` for lines it cannot PARSE,
    * so a structurally-valid line quarantined for a null doc_id/text
    * would otherwise reach the reprocess queue as a lossy `to_json`
    * re-serialization — unknown extra fields, key order, and formatting
    * silently dropped (the r8 ADVICE finding). Keeping the raw `value`
    * column alongside the parsed struct preserves the ORIGINAL line for
    * every quarantined row, whatever the reason it quarantined. */
  def readDocumentsJsonl(spark: SparkSession, path: String,
      cacheForSplit: Boolean = false): JsonlCorpus = {
    val raw = spark.read.text(path)
      .withColumn("p", from_json(col("value"), documentsSchema,
        Map("mode" -> "PERMISSIVE",
          "columnNameOfCorruptRecord" -> "_corrupt_record")))
    // Both returned frames derive from the same lazy scan: a caller that
    // materializes both (the standard quarantine workflow — land good,
    // file corrupt for reprocessing) would read AND Jackson-parse the
    // whole corpus twice. cacheForSplit=true persists the parsed scan
    // DISK_ONLY for exactly that workflow; call release() after both
    // actions. Default off: a good-only consumer must not pay a cache.
    val parsed =
      if (cacheForSplit)
        raw.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      else raw
    // p is null only for blank/whitespace lines (the json source silently
    // skips those; a text read surfaces them — quarantine, don't drop)
    val bad = col("p").isNull || col("p._corrupt_record").isNotNull ||
      col("p.doc_id").isNull || col("p.text").isNull
    JsonlCorpus(
      good = parsed.filter(!bad)
        .select("p.doc_id", "p.text", "p.lang", "p.source", "p.n_chars"),
      corrupt = parsed.filter(bad).select(col("value").as("raw_line")),
      release = () =>
        if (cacheForSplit) { parsed.unpersist(blocking = false); () })
  }

  /** Export a documents frame as JSONL (one object per line, canonical
    * column order). Deterministic field order so a byte-level diff of two
    * exports is meaningful. */
  def writeDocumentsJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(
        col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))).as("value"))
      .write.mode("overwrite").text(path)
}
