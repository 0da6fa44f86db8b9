package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JSONL corpus source: lossless round-trip vs the parquet corpus, and
  * the permissive quarantine contract (torn/null-key lines surface in
  * `corrupt`, never silently vanish, never poison `good`). */
class TextCorpusSourceSpec extends SparkSpec {

  private def corpusHash(df: org.apache.spark.sql.DataFrame): String =
    df.select(md5(concat_ws("",
        col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))).as("h"))
      .agg(md5(concat_ws("", collect_list(col("h")))).as("all"))
      .head().getString(0)

  private def sortedHash(df: org.apache.spark.sql.DataFrame): String =
    corpusHash(df.orderBy("doc_id"))

  test("parquet -> jsonl -> parquet round-trip is content-identical") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    TextCorpusSource.writeDocumentsJsonl(src, s"$dir/docs")
    val back = TextCorpusSource.readDocumentsJsonl(spark, s"$dir/docs")
    assert(back.corrupt.count() == 0)
    assert(back.good.count() == src.count())
    assert(sortedHash(back.good) == sortedHash(src))
  }

  test("torn and null-key lines quarantine; good rows are untouched") {
    val dir = java.nio.file.Files.createTempDirectory("jsonlq").toString
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web", "n_chars": 10}""",
      """{"doc_id": 2, "text": "gamma", "lang": "en", "source": "web", "n_chars": 5}""",
      """{"doc_id": 3, "text": "delta", "lang": "en"""", // torn mid-object
      """not json at all""",
      """{"text": "orphan", "extra_field": [1, 2], "doc_id": null,  "lang": "en", "source": "web", "n_chars": 6}""",
      """{"doc_id": 4, "lang": "en", "source": "web", "n_chars": 0}""" // no text
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val got = TextCorpusSource.readDocumentsJsonl(spark, dir)
    assert(got.good.count() == 2, "only fully-keyed parseable rows are good")
    assert(got.good.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    val corrupt = got.corrupt.collect().map(_.getString(0))
    assert(corrupt.length == 4, s"good + corrupt must reconcile: $corrupt")
    assert(corrupt.exists(_.contains("not json at all")),
      "raw line preserved for the reprocess queue")
    // a STRUCTURALLY-VALID line quarantined only for a null key must also
    // reach the queue as the ORIGINAL line — unknown extra fields, key
    // order, and spacing intact, not a lossy to_json re-serialization
    assert(corrupt.contains(lines(4)),
      s"null-key line must be preserved verbatim: $corrupt")
    assert(corrupt.toSet == Set(lines(2), lines(3), lines(4), lines(5)),
      "every quarantined row is its exact input line")
  }

  test("cacheForSplit caches the shared scan, release() drops it, results identical") {
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("jsonlc").toString
    TextCorpusSource.writeDocumentsJsonl(src, s"$dir/docs")
    // plan-shape probes target OUR temp-dir scan only, so a concurrently
    // running suite's cache entries can never flip these assertions
    def usesCache(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("InMemoryRelation")
    // default path, probed before any cache entry for this dir exists
    val plain = TextCorpusSource.readDocumentsJsonl(spark, s"$dir/docs")
    assert(!usesCache(plain.good), "the default load must not pay a cache")
    val plainHash = sortedHash(plain.good)
    val cached = TextCorpusSource.readDocumentsJsonl(spark, s"$dir/docs",
      cacheForSplit = true)
    // the quarantine workflow: materialize BOTH splits off the one scan
    assert(cached.good.count() == plain.good.count())
    assert(cached.corrupt.count() == 0)
    assert(usesCache(cached.good) && usesCache(cached.corrupt),
      "both splits must read the one cached parsed scan")
    assert(sortedHash(cached.good) == plainHash,
      "the cache is plan-only: same rows either way")
    cached.release()
    val again = TextCorpusSource.readDocumentsJsonl(spark, s"$dir/docs")
    assert(!usesCache(again.good),
      "release() must drop the shared-scan cache entry")
    assert(sortedHash(again.good) == plainHash)
    again.release() // no-op on the uncached path, by contract
  }
}
