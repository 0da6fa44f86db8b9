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
    * the raw unparseable/null-key lines for the reprocess queue. */
  final case class JsonlCorpus(good: DataFrame, corrupt: DataFrame)

  /** Read a JSONL documents corpus with the explicit schema and the
    * permissive quarantine split. One pass; no inference scan. */
  def readDocumentsJsonl(spark: SparkSession, path: String): JsonlCorpus = {
    val raw = spark.read
      .schema(documentsSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      // the permissive parser materializes lazily; cacheless split needs
      // the corrupt column referenced from the SAME read, so keep one frame
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"), col("_corrupt_record"))
    val bad = col("_corrupt_record").isNotNull ||
      col("doc_id").isNull || col("text").isNull
    JsonlCorpus(
      good = raw.filter(!bad)
        .select("doc_id", "text", "lang", "source", "n_chars"),
      corrupt = raw.filter(bad)
        .select(coalesce(col("_corrupt_record"),
          to_json(struct(col("doc_id"), col("text"), col("lang"),
            col("source"), col("n_chars")))).as("raw_line")))
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
