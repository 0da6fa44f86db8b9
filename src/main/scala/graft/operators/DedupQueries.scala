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

  /** Long-form distinct shingles (doc_id, g) via a typed flatMap: the
    * column-expression shingling above is a higher-order function chain
    * that Catalyst evaluates interpreted (HOFs don't codegen) at ~19us per
    * shingle; the JIT'd flatMap emits identical strings ~10x faster and
    * feeds every pair operator. Kept semantically in lockstep with the
    * DuckDB oracle's list comprehension (same truncating tail slices,
    * first-occurrence distinct). */
  private def shingleRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    t(spark, dir, "documents").select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = text.split(' ')
        val n = math.max(toks.length - 2, 1)
        val seen = new scala.collection.mutable.LinkedHashSet[String]
        var i = 0
        while (i < n) {
          seen += toks.slice(i, math.min(i + 3, toks.length)).mkString(" ")
          i += 1
        }
        seen.iterator.map(g => (id, g))
      }.toDF("doc_id", "g")
  }

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
    // materialize shingles once: e feeds both sides of the self-join
    // (at cluster scale this is persist-before-self-join; locally a cheap
    // eager checkpoint)
    val e = shingleRows(spark, dir).localCheckpoint()
    val sizes = e.groupBy("doc_id").agg(count(lit(1)).as("n"))
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
    val e = shingleRows(spark, dir).localCheckpoint()
    // k minhash signatures as k codegen'd min-aggregates over the long-form
    // shingle rows (map-side combine; no per-doc array materialization)
    val sigCols = (0 until numHashes).map(j =>
      min(xxhash64(concat(lit(j.toString), col("g")))).as(s"m$j"))
    val sigs = e.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until numHashes / rowsPerBand).map(b =>
        xxhash64(concat_ws("|",
          (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*))): _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .localCheckpoint() // minhash pipeline runs once, not per join side
    val cands = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .localCheckpoint()
    // exact-Jaccard verification of the candidates from the same long-form
    // rows: intersection via shingle equi-join, union from per-doc sizes
    val sizes = e.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(e.as("ea"), col("doc_a") === col("ea.doc_id"))
      .join(e.as("eb"), col("doc_b") === col("eb.doc_id") && col("ea.g") === col("eb.g"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    cands.join(inter, Seq("doc_a", "doc_b"), "left")
      .na.fill(0L, Seq("inter"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash fingerprint + near-dup pairs by Hamming distance: 32-bit
    * fingerprint from token-hash bit votes, banded into 4 bytes for
    * sub-quadratic candidate generation, verified with bit_count(xor).
    */
  def x5SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // feature on 3-word shingles, not unigrams: this corpus shares one small
    // vocabulary, so unigram simhashes collapse to near-identical values.
    // One hash per feature, then the typed SimhashAgg (a single while-loop
    // per feature with map-side combine) — NOT a nested per-bit lambda
    // (re-hashes 64x, interpreted) and NOT 64 conditional sum columns
    // (generated code exceeds JIT limits); both measured ~10-80x slower
    import spark.implicits._
    val featHashes = shingleRows(spark, dir)
      .select(col("doc_id"), xxhash64(col("g")).as("h"))
      .as[(Long, Long)]
    val sim = featHashes.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.SimhashAgg.toColumn.name("simhash"))
      .toDF("doc_id", "simhash")
    val banded = sim.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(7)),
        b => call_function("shiftright", col("simhash"), b * 8).bitwiseAND(255))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_key")
      .localCheckpoint() // simhash pipeline runs once, not per join side
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
