package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Training-data deduplication operators over the `documents` table —
 * the LLM-pipeline surface (BASELINE.json north_star). All expression-only
 * (whole-stage-codegen friendly): shingling, MinHash, SimHash and Jaccard
 * are built from `transform`/`sequence`/`xxhash64`/`array_*`, never a UDF.
 */
object DedupQueries {
  import Tables._

  /** Word tokens (documents are single-space separated). */
  private def tokens(c: Column): Column = split(c, " ")

  /** 3-word shingles of a token array (at least one shingle per doc). */
  private def shingles(toks: Column): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - 2, lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(3))))

  /** Exact dedupe summary: total vs content-distinct docs by sha256(text)
    * (the classic hash-groupBy exact dedupe at corpus scale). */
  def x1ExactDupStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .agg(
        count(lit(1)).as("total_docs"),
        countDistinct(sha2(col("text").cast("binary"), 256)).as("distinct_docs"))
      .withColumn("duplicate_docs", col("total_docs") - col("distinct_docs"))

  /** Normalized exact dedupe: case-folded, whitespace-collapsed content key.
    * Finds near-dups that differ only in formatting. */
  def x2NormalizedDup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(trim(regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary"))
        .as("norm_key"))
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keep_doc_id"))
      .orderBy("norm_key")

  /** Exact n-gram Jaccard near-dup pairs: distinct 3-word shingle sets,
    * pairs blocked on a shared shingle, inter/union similarity. This is the
    * exact (quadratic-in-collisions) baseline; x4 MinHash-LSH is the
    * approximate scale path that avoids materializing all pairs.
    */
  def x3NgramJaccardPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(shingles(tokens(col("text")))).as("sh"))
    val e = d.select(col("doc_id"), explode(col("sh")).as("g"))
    val sizes = d.select(col("doc_id"), size(col("sh")).as("n"))
    val inter = e.as("a").join(e.as("b"),
        col("a.g") === col("b.g") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash + LSH banding near-dup candidates — the sub-quadratic scale
    * path: k=16 signatures from seeded xxhash64 minima over shingles,
    * 4 bands x 4 rows; docs colliding in any band are candidates, then
    * exact-Jaccard verified. At 100 TB only the band-key shuffle is wide;
    * no all-pairs stage exists.
    */
  def x4MinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val numHashes = 16
    val rowsPerBand = 4
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(shingles(tokens(col("text")))).as("sh"))
    val sigs = d.withColumn("sig", array(
      (0 until numHashes).map(j =>
        array_min(transform(col("sh"), s => xxhash64(concat(lit(j.toString), s))))): _*))
    val banded = sigs.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(numHashes / rowsPerBand - 1)),
        b => xxhash64(concat_ws("|", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_a", "doc_b")
    cands
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprint + near-dup pairs by Hamming distance: 32-bit
    * fingerprint from token-hash bit votes, banded into 4 bytes for
    * sub-quadratic candidate generation, verified with bit_count(xor).
    */
  def x5SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val bits = 64
    // feature on 3-word shingles, not unigrams: this corpus shares one small
    // vocabulary, so unigram simhashes collapse to near-identical values
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), array_distinct(shingles(tokens(col("text")))).as("feats"))
    // one hash per feature, then 64 codegen'd conditional sums per doc —
    // NOT a nested per-bit lambda, which would re-hash every feature 64x
    // in interpreted expression mode (measured 80x slower)
    val featHashes = d.select(col("doc_id"), explode(col("feats")).as("f"))
      .withColumn("h", xxhash64(col("f")))
    val voteCols = (0 until bits).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val votes = featHashes.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
    val simhashExpr = (0 until bits).map(b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((a, c) => a.bitwiseOR(c))
    val sim = votes.select(col("doc_id"), simhashExpr.as("simhash"))
    val banded = sim.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => call_function("shiftright", col("simhash"), b * 8).bitwiseAND(255))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= 12)
      .orderBy("doc_a", "doc_b")
  }
}
