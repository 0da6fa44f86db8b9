package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline: token statistics,
 * quality scoring, language-likelihood heuristics, fingerprinting.
 * Expression-only — every metric is arithmetic over `length`/`replace`
 * so it stays in whole-stage codegen and has an exact DuckDB analog.
 */
object TextQueries {
  import Tables._

  /** Occurrences of `word` as a standalone token (space-padded count).
    * Plain replace (not regexp) — identical non-overlapping left-to-right
    * semantics in Spark and DuckDB without regex-dialect risk. */
  private[operators] def wordCount(text: Column, word: String): Column =
    ((length(concat(lit(" "), text, lit(" "))) -
      length(replace(concat(lit(" "), text, lit(" ")), lit(s" $word "), lit(" ")))) /
      (word.length + 1)).cast("long")

  /** Whitespace token count without split(): spaces + 1.
    * (private[graft]: st16's static totals reuse it cross-package.) */
  private[graft] def tokenCount(text: Column): Column =
    (length(text) - length(replace(text, lit(" "), lit(""))) + 1).cast("long")

  /** EXACT standalone-token occurrence count. [[wordCount]]'s single-pad
    * replace undercounts ADJACENT repeats ("a a a" counts 2, not 3 — the
    * middle match consumes the shared space), which is fine for its
    * presence-style callers but wrong for a true term frequency. Doubling
    * every space first gives each token its own private padding, so the
    * " word " matches are disjoint and the count is exact — still plain
    * replace arithmetic (codegen'd, dialect-free). */
  private[operators] def tokenOcc(text: Column, word: String): Column = {
    val p = concat(lit(" "), replace(text, lit(" "), lit("  ")), lit(" "))
    ((length(p) - length(replace(p, lit(s" $word "), lit("")))) /
      (word.length + 2)).cast("long")
  }

  /** Unigram-LM typicality scoring, log-free: a document's score is the
    * MEAN CORPUS FREQUENCY of its tokens (the monotone stand-in for
    * unigram log-likelihood — higher = more typical of the corpus; real
    * pipelines threshold perplexity, but log() is libm-dependent and
    * would break bitwise oracle parity, while this score is integer-exact
    * until one final rounded divide). A doc is flagged ATYPICAL iff its
    * score falls below 97% of the corpus-pooled mean, compared
    * CROSS-MULTIPLIED in integers (100·s·N < 97·S·n) so the verdict
    * involves no floating point at all — in decimal(38,0), where the
    * worst-case product (gs ≤ (Σcf)² with n_doc ≈ 10^3 tokens) stays
    * under 10^31 even at a 100 TB corpus, and past 10^38 Spark's ANSI
    * decimal errors LOUDLY rather than wrapping (the oracle's BIGINT
    * errors far earlier, at 2^63 — that bound caps the cross-engine
    * check, not this query's correctness).
    *
    * Scale design: the frequency table is vocab-sized and joins the token
    * stream WITHOUT a broadcast hint (x8's rationale — a web-scale vocab
    * is corpus-proportional; AQE broadcasts when it measures small). Both
    * the token count and the frequency join shuffle on the token key —
    * one partitioning, map-side partial aggs; the per-doc rollup then
    * shuffles compact (doc_id, lang, 2 longs) rows, and the 1-row global
    * broadcasts back over the per-doc table (q11's shape). */
  /** The 97%-of-global-mean atypicality verdict, cross-multiplied in
    * decimal(38,0): `100·s·gn < 97·gs·n` over per-doc (s, n) and global
    * (gs, gn) exact sums. Widened from long because the factors are
    * corpus-scale totals — long products wrap SILENTLY in Spark at 2^63
    * while DuckDB raises, so the engines could diverge exactly where the
    * oracle can no longer look (y14's unigram sums get near the edge at
    * large SFs; y19's bigram cf·gn products square the exposure). */
  private def atypicalFlag: Column = {
    def d(c: Column) = c.cast("decimal(38,0)")
    (lit(100L) * d(col("s")) * d(col("gn")) <
      lit(97L) * d(col("gs")) * d(col("n"))).cast("long")
  }

  def y14UnigramTypicality(spark: SparkSession, dir: String): DataFrame = {
    val tok = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tk"))
    val freq = tok.groupBy("tk").agg(count(lit(1)).as("cf"))
    val perDoc = tok.join(freq, "tk")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), sum("cf").as("s"))
    val g = perDoc.agg(sum("s").as("gs"), sum("n").as("gn"))
    perDoc.join(broadcast(g))
      .withColumn("atypical", atypicalFlag)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("atypical").as("atypical_docs"),
        // two exact long sums -> one IEEE divide, same order as the oracle
        round(sum("s").cast("double") / sum("n"), 4).as("avg_token_freq"))
      .orderBy("lang")
  }

  /** y19: BIGRAM-LM typicality — y14's unigram scoring extended to the
    * order-2 model (the perplexity-style filter real pipelines run: word
    * salad scores typical under a unigram LM but its BIGRAMS are rare, so
    * the order-2 score is what catches shuffled/templated text). Bigrams
    * come from a per-row `zip_with(slice, slice)` over the split array —
    * no position join, no second corpus pass; a doc's score is the mean
    * corpus frequency of its bigrams (log-free, the y14/y15 rationale),
    * the atypicality flag cross-multiplies exact longs against the 97%
    * global mean threshold, and the per-lang mean divides two exact sums
    * once. Docs with <2 tokens have no bigrams and drop out (both
    * engines: explode/unnest of an empty list). Scale: y14's exact shape
    * — one bigram-keyed exchange serves freq and the join back, the 1-row
    * global broadcasts; bigram strings shuffle (vocabulary², the honest
    * cost of an order-2 LM — production would hash them to longs, same
    * algebra). */
  def y19BigramTypicality(spark: SparkSession, dir: String): DataFrame = {
    val a = split(col("text"), " ")
    val bg = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(zip_with(slice(a, lit(1), size(a) - 1), slice(a, lit(2), size(a) - 1),
          (x, y) => concat(x, lit(" "), y))).as("bg"))
    val freq = bg.groupBy("bg").agg(count(lit(1)).as("cf"))
    val perDoc = bg.join(freq, "bg")
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n"), sum("cf").as("s"))
    val g = perDoc.agg(sum("s").as("gs"), sum("n").as("gn"))
    perDoc.join(broadcast(g))
      .withColumn("atypical", atypicalFlag)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("atypical").as("atypical_docs"),
        round(sum("s").cast("double") / sum("n"), 4).as("avg_bigram_freq"))
      .orderBy("lang")
  }

  /** TF-IDF top terms, log-free (the y14 rationale: idf stays the exact
    * rational N/df instead of log(N/df) — the same per-document ranking,
    * since log is monotone, without libm in the oracle path): each
    * document's 3 most characteristic terms with their tf / df evidence.
    * score = tf·N/df evaluates as one double multiply + one divide over
    * exactly-representable integers, so ranking is bitwise deterministic
    * (term tiebreak).
    *
    * Scale design: tf and df come from the same token-keyed shuffle (df
    * aggregates tf's output — no second corpus pass), the df join carries
    * no broadcast hint (vocab is corpus-proportional; AQE decides), the
    * 1-row N broadcasts, and the per-doc top-3 plans with the
    * WindowGroupLimit pushdown, so each partition forwards at most 3
    * candidate rows per doc_id to the final window sort. */
  def y15TfIdfTerms(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tf = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .join(broadcast(n))
      .withColumn("score", col("tf").cast("double") * col("n_docs") / col("df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("score"), 4).as("tfidf"), col("rank"))
      .orderBy("doc_id", "rank")
  }

  /** Per-language token statistics: doc counts, token totals, avg doc length. */
  def y1TokenStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("n_tokens"), 4).as("avg_tokens"),
        sum("n_chars").as("total_chars"))
      .orderBy("lang")

  /** Quality scoring: stopword density, mean token length, repetition ratio
    * (distinct/total tokens). The classic cheap pre-filters for web-scale
    * corpus cleaning. */
  def y2QualityScore(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("stop_hits",
        wordCount(col("text"), "the") + wordCount(col("text"), "a"))
    d.select(
        col("doc_id"),
        col("n_tokens"),
        round(col("stop_hits").cast("double") / col("n_tokens"), 4).as("stopword_ratio"),
        round((col("n_chars") - col("n_tokens") + 1).cast("double") / col("n_tokens"), 4)
          .as("avg_token_len"))
      .withColumn("quality_band",
        when(col("stopword_ratio") >= 0.12, "high")
          .when(col("stopword_ratio") >= 0.05, "medium")
          .otherwise("low"))
      .orderBy("doc_id")
  }

  /** Quality-decile binning: rank every document by its stopword-density
    * quality score into 10 equal-frequency buckets (ntile semantics over a
    * TOTAL order — ties broken by doc_id, so the binning is deterministic
    * and oracle-able), then per-decile stats: the quality-mix planning
    * table a curriculum / re-sampling step consumes ("upsample the top
    * deciles, drop the bottom one").
    *
    * Scale design — EXACT deciles with NO unpartitioned window: a bare
    * `ntile(10) OVER (ORDER BY ...)` plans a single-task global sort (the
    * textbook scale-killer — the whole corpus through one reducer). Instead:
    * (1) range-partition by the sort key (parallel range exchange),
    * (2) collect per-partition ROW COUNTS — a bounded driver collect of one
    *     long per partition, never data,
    * (3) rank WITHIN partitions only (every window task is
    *     corpus/nParts-bounded) and add the partition's global offset,
    * (4) derive the ntile bucket from the exact global index in closed form:
    *     with q = N/10 and r = N%10, the first r buckets hold q+1 rows —
    *     bucket(i) = i div (q+1)           for i <  r*(q+1)
    *               = r + (i - r*(q+1)) div q  otherwise   (then 1-based).
    * Output is bit-identical to the global ntile (same total order, same
    * bucket boundaries) — the DuckDB ntile oracle still hash-matches — but
    * the plan's only wide ops are a range exchange and a pid-partitioned
    * window. The approximate alternative (approx_percentile cutoffs +
    * broadcast CASE) trades exactness for one fewer shuffle; this form
    * keeps the hash-matching contract. */
  def y9QualityDeciles(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val scored = t(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("stop_hits",
        wordCount(col("text"), "the") + wordCount(col("text"), "a"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("stop_hits").cast("double") / col("n_tokens"), 4).as("score"))
    // scale-safe global rank: ExactOffsets' range-partition + broadcast
    // prefix-offset scaffold (shared with z3/m5) replaces the single-task
    // unpartitioned ntile window
    val (withOffsets, total) = ExactOffsets.withPartitionOffsets(
      spark, scored, Seq(col("score"), col("doc_id")), lit(1L), "offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy(col("score"), col("doc_id"))
    val q10 = total / 10
    val r10 = total % 10
    val gi = row_number().over(w).cast("long") - 1 + col("offset")
    // exact ntile arithmetic; gi < 2^53 keeps the double-division floor exact
    val decile = (when(gi < lit(r10 * (q10 + 1)), floor(gi / lit(q10 + 1)))
      .otherwise(lit(r10) + floor((gi - lit(r10 * (q10 + 1))) / lit(math.max(q10, 1L))))
      + 1).cast("long")
    withOffsets
      .withColumn("decile", decile)
      .groupBy("decile")
      .agg(count(lit(1)).as("n_docs"),
        round(min("score"), 4).as("min_score"),
        round(max("score"), 4).as("max_score"),
        sum("n_tokens").as("total_tokens"))
      .orderBy("decile")
  }

  /** Deterministic mixture resampling: rebalance the corpus to equal
    * per-language counts by downsampling every language to the smallest
    * class, with md5(doc_id)-keyed acceptance — the domain/language
    * mixture-control step of a training-data pipeline (y7's stable-slice
    * trick, generalized to data-derived per-group rates). A doc is kept iff
    * hash_frac(doc_id) < target_n / n_lang; the comparison is INTEGER
    * (h * n_lang < target_n * 2^32, all BIGINT) so acceptance is exact on
    * both engines with zero floating-point boundary risk. No RNG, no seed
    * coordination: re-running over a grown corpus keeps every surviving doc
    * stable unless its language's rate changed. Scale: the per-lang rate
    * table is a groupBy over the corpus (one agg exchange) collapsed to
    * #langs rows, then broadcast — the corpus itself never shuffles. */
  def y10MixtureResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val rates = counts.crossJoin(counts.agg(min("n_lang").as("target_n")))
    docs.join(broadcast(rates), "lang")
      .withColumn("h",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 8), 16, 10)
          .cast("long"))
      .filter(col("h") * col("n_lang") < col("target_n") * lit(4294967296L))
      .select(col("doc_id"), col("lang"), col("n_lang"), col("target_n"))
      .orderBy("doc_id")
  }

  /** Lexical diversity per source: type-token ratio (distinct tokens /
    * total tokens) — low TTR flags templated or machine-generated feeds
    * before they dominate a training mix. The distinct side explodes
    * tokens, but partial aggregation dedupes (source, token) pairs
    * map-side, so the exchange carries per-partition vocabularies, not the
    * token stream; the total side never explodes at all (space-count
    * arithmetic). */
  def y11LexicalDiversity(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val totals = docs.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("total_tokens"))
    val uniq = docs
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source").agg(countDistinct("tok").as("distinct_tokens"))
    totals.join(uniq, "source")
      .select(col("source"), col("n_docs"), col("total_tokens"), col("distinct_tokens"),
        round(col("distinct_tokens").cast("double") / col("total_tokens"), 6).as("ttr"))
      .orderBy("source")
  }

  /** y20: token-frequency SPECTRUM per source — the Zipf/Heaps corpus-
    * health diagnostic a curation pipeline reads before trusting y11's
    * one-number TTR: for each source, how many distinct token types sit
    * in each frequency octave k = ⌊log₂(freq)⌋ and how much occurrence
    * mass they carry. A natural corpus shows the Zipf signature (hapax-
    * heavy k=0 class, geometrically thinning types with roughly constant
    * mass per octave); templated or synthetic feeds collapse it. The
    * octave is computed EXACTLY as `length(bin(f)) − 1` — integer bit
    * length, no log/libm float anywhere — so both engines bucket
    * identically at any frequency. Scale: one tokenize pass; the
    * (source, token) frequency agg partial-combines map-side (the
    * shuffle carries each partition's distinct vocabulary, not the token
    * stream) and the octave rollup is a second, vocabulary-bounded
    * exchange down to |sources|·~20 rows. */
  def y20FreqSpectrum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("f"))
      .withColumn("k", (length(expr("bin(f)")) - 1).cast("long"))
      .groupBy("source", "k")
      .agg(count(lit(1)).as("n_types"), sum("f").as("n_occurrences"))
      .orderBy("source", "k")

  /** Language-likelihood heuristic: English-function-word density score per
    * doc, aggregated per labeled lang. (The corpus text is synthetic word
    * soup, so this measures the heuristic's behavior, not real language ID —
    * the operator shape is what a real pipeline uses with a bigger profile.) */
  def y3LangIdHeuristic(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("en_score",
        round((wordCount(col("text"), "the") + wordCount(col("text"), "a"))
          .cast("double") / col("n_tokens"), 4))
      .withColumn("pred_en", (col("en_score") >= lit(0.08)).cast("int"))
    d.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("pred_en").as("pred_en_docs"),
        round(avg("en_score"), 4).as("avg_en_score"))
      .orderBy("lang")
  }

  /** BPE-flavored subword token counting: a regex tokenizer (letter runs /
    * digit runs / single punctuation — the GPT-2 pre-tokenizer shape,
    * restricted to dialect-neutral character classes so Spark's Java regex
    * and DuckDB's RE2 agree) next to the whitespace count, per language.
    * The "how many tokens is this corpus" question every training-data
    * budget starts with. */
  def y6BpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val bpeish = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    t(spark, dir, "documents")
      .withColumn("ws_tokens", tokenCount(col("text")))
      .withColumn("bpe_tokens", size(regexp_extract_all(col("text"), lit(bpeish), lit(0))).cast("long"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("ws_total"),
        sum("bpe_tokens").as("bpe_total"),
        round(avg(col("bpe_tokens").cast("double") / col("ws_tokens")), 4)
          .as("subwords_per_word"))
      .orderBy("lang")
  }

  /** JSON property extraction over the events stream: pull `$.k` out of the
    * `props` JSON column (codegen'd get_json_object — no UDF) and aggregate
    * per event type. The semi-structured-column path every telemetry /
    * metadata pipeline needs. */
  def y5JsonProps(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        round(avg("k"), 4).as("avg_k"),
        min("k").as("min_k"),
        max("k").as("max_k"))
      .orderBy("event_type")

  /** Deterministic hash sampling: a reproducible corpus split keyed on
    * md5(doc_id) — the standard way a training pipeline carves stable
    * train/holdout slices (re-running over a grown corpus keeps every
    * previously-sampled doc in the same slice; no RNG state, no seed
    * coordination across executors). The first 4 hex chars mod 10 < 2
    * select a ~20% slice; output is per-lang slice counts plus the exact
    * membership, so downstream joins can consume the slice directly.
    * Fully codegen'd expressions; md5 over the decimal doc_id string has an
    * exact DuckDB analog. */
  def y7HashSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
          .cast("long") % 10)
      .filter(col("bucket") < 2)
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")

  /** Intra-document repetition scoring — the Gopher/C4-family quality rule:
    * what fraction of a doc's 3-word shingles are repeats of an earlier
    * shingle in the SAME doc? Boilerplate, templated spam, and decoding
    * loops score high and get filtered before training. Pure column HOFs
    * over the same truncating-tail shingle formula as x3/y4 (total vs
    * distinct shingle counts), so the whole metric stays in codegen with an
    * exact DuckDB analog; one narrow pass, one agg exchange. */
  def y8Repetition(spark: SparkSession, dir: String): DataFrame = {
    val sh = wordShingles(col("text"))
    t(spark, dir, "documents")
      .withColumn("n_grams", size(sh).cast("long"))
      .withColumn("n_distinct", size(array_distinct(sh)).cast("long"))
      .withColumn("rep_ratio",
        round((col("n_grams") - col("n_distinct")).cast("double") / col("n_grams"), 4))
      .withColumn("flagged", (col("rep_ratio") > lit(0.2)).cast("int"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("flagged").as("flagged_docs"),
        round(avg("rep_ratio"), 4).as("avg_rep_ratio"),
        round(max("rep_ratio"), 4).as("max_rep_ratio"))
      .orderBy("lang")
  }

  /** Document fingerprinting (winnowing-flavored): distinct-ordered set of
    * the k = 8 smallest shingle hashes per doc — a compact content
    * signature robust to local edits (near-dups share keys: 484 distinct
    * over 500 sf0.001 docs). Round-7 upgrade: the shingle hash is the
    * first 60 bits of md5 instead of seeded xxhash64, which both engines
    * compute — so the whole signature, min-selection and all, is now
    * HASH-ORACLED rather than justified-Spark-only (p3's
    * hash-for-oracle-parity tradeoff: a production deployment swaps
    * xxhash back in; the winnowing algebra is unchanged). */
  def y4Fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val sh = wordShingles(col("text"))
    def h60(c: Column): Column =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    t(spark, dir, "documents")
      .select(col("doc_id"),
        slice(array_sort(array_distinct(transform(sh, s => h60(s)))), 1, 8)
          .as("fingerprint"))
      .withColumn("fp_key",
        h60(concat_ws(",", transform(col("fingerprint"), _.cast("string")))))
      .select("doc_id", "fp_key")
      .orderBy("doc_id")
  }

  /** Per-source keep cap for [[y13SourceCap]]. */
  private[operators] val SourceCap = 15

  /** Per-source document cap — the C4/RefinedWeb-style per-domain limit
    * that stops any single feed from dominating the corpus: within each
    * source keep the top [[SourceCap]] documents by quality (y2's
    * stopword-density score, ties broken by doc_id so the cut is total,
    * deterministic, and oracle-able), and report the per-source admit
    * manifest (docs seen, kept, dropped, surviving tokens).
    *
    * Scale design: ONE window partitioned by source — the natural
    * per-domain parallelism (a 100 TB web corpus has millions of domains,
    * so partitions stay small; a pathological mega-domain is the k1
    * salting story, not this operator's). The rollup aggregates the
    * kept/dropped split map-side; only |sources| rows exchange. */
  def y13SourceCap(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("score").desc, col("doc_id"))
    val scored = t(spark, dir, "documents")
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("stop_hits",
        wordCount(col("text"), "the") + wordCount(col("text"), "a"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        round(col("stop_hits").cast("double") / col("n_tokens"), 4).as("score"))
    scored
      .withColumn("rk", row_number().over(w))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("rk") <= SourceCap, 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("rk") > SourceCap, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("rk") <= SourceCap, col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  /** Sequence-packing capacity (tokens per training sequence). */
  private[operators] val PackCapacity = 2048L

  /** Concat-and-chop sequence packing — the GPT-style step that turns a
    * curated corpus into fixed-width training sequences: documents are
    * concatenated in doc_id order and chopped every [[PackCapacity]]
    * tokens; a document whose tokens straddle a boundary continues into
    * the next sequence. Emits the packing MANIFEST per sequence: how many
    * documents touch it, how many carried over from the previous one, and
    * its token fill (= capacity everywhere except the final partial).
    *
    * Scale design — an EXACT global running token offset with NO
    * unpartitioned window (y9's pattern, summing tokens instead of
    * counting rows): range-partition by doc_id, one O(nParts) pass
    * collects per-partition token sums, the exclusive prefix offsets
    * broadcast back, and each partition's window cumsum + its offset is
    * the exact global offset. The explode fans each doc to the 1 +
    * toks/capacity sequences it touches — bounded expansion, and the
    * whole job is two passes over (doc_id, token-count) longs, never the
    * text. */
  def z3SequencePack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cap = PackCapacity
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), tokenCount(col("text")).as("toks"))
      .filter(col("toks") > 0)
    // exact global token offsets via the shared ExactOffsets scaffold (y9)
    val (withOffsets, _) = ExactOffsets.withPartitionOffsets(
      spark, toks, Seq(col("doc_id")), col("toks"), "tok_offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy("doc_id")
    withOffsets
      .withColumn("fin", sum(col("toks")).over(w) + col("tok_offset"))
      .withColumn("strt", col("fin") - col("toks"))
      // every sequence this doc's token interval [strt, fin) touches;
      // DIV = exact integer division (a double `/` would round at 2^53)
      .withColumn("seq_id",
        explode(sequence(expr(s"strt DIV $cap"), expr(s"(fin - 1) DIV $cap"))))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("strt") < col("seq_id") * cap, 1L).otherwise(0L)).as("n_carried"),
        sum(least(col("fin"), (col("seq_id") + 1) * cap) -
          greatest(col("strt"), col("seq_id") * cap)).as("fill_tokens"))
      .orderBy("seq_id")
  }

  /** Z4 stratified train/val/test split — the assignment every corpus ships
    * with: a deterministic md5-keyed bucket per document (y7's hash bridge,
    * mod 100) mapped 80/10/10, rolled up per (source, split) so the
    * stratification is auditable: the hash is uniform WITHIN each source,
    * so the fractions hold per stratum, not just globally, and the
    * assignment is stable under corpus growth (a doc's split never changes
    * when neighbors arrive — unlike row_number()-based splits, which
    * reshuffle everything on every insert). Scale: pure per-row codegen'd
    * hashing, one |sources|x3-row rollup exchange; no window, no join. */
  def z4StratifiedSplit(spark: SparkSession, dir: String): DataFrame = {
    val bucket = conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4), 16, 10)
      .cast("long") % 100
    t(spark, dir, "documents")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source", "split")
  }

  /** ST10's stateless admit gate (batch AND streaming: nothing here is
    * stateful, so the same plan runs under a micro-batch): score each
    * incoming document (z1's quality formulas verbatim) and check its
    * first-8-word prefix digest against the existing corpus — the
    * template/boilerplate-dup rule that catches re-crawls whose bodies
    * drifted but whose headers didn't (exact-text digests catch nothing on
    * this corpus; the 8-word prefix hits ~11% of the increment). Admit =
    * quality gate AND no prefix hit. Scale: per-row codegen'd scoring; the
    * static digest side dedupes once per (re)start and joins per
    * micro-batch — small enough to broadcast in the common case, and a
    * stream-static join degrades to shuffle (never driver OOM) when it
    * isn't. */
  def st10AdmitGate(docs: DataFrame, corpus: DataFrame): DataFrame = {
    val pfx = md5(concat_ws(" ", slice(split(col("text"), " "), 1, 8)))
    val sh = wordShingles(col("text"))
    val corpusPfx = corpus.select(pfx.as("g")).distinct().withColumn("hit", lit(1L))
    docs
      .withColumn("n_tokens", tokenCount(col("text")))
      .withColumn("stop_ratio",
        round((wordCount(col("text"), "the") + wordCount(col("text"), "a"))
          .cast("double") / col("n_tokens"), 4))
      .withColumn("rep_ratio",
        round((size(sh) - size(array_distinct(sh))).cast("double") / size(sh), 4))
      .withColumn("g", pfx)
      .join(corpusPfx, Seq("g"), "left_outer")
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("stop_ratio"), col("rep_ratio"),
        coalesce(col("hit"), lit(0L)).as("is_prefix_dup"),
        (col("stop_ratio") >= 0.05 && col("rep_ratio") <= 0.2 && col("hit").isNull)
          .cast("long").as("admitted"))
  }

  /** Email regex shared by the Spark query and its spec; the character-class
    * subset that Java regex and DuckDB's RE2 interpret identically. */
  private[operators] val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  /** Phone-token regex (the injected 555- exchange shape). */
  private[operators] val phoneRe = "\\b555-[0-9]{4}\\b"

  /** PII detection + scrubbing — the redaction pass every training-data
    * pipeline runs before a corpus ships: find email/phone tokens, count
    * them, and measure what global redaction changes. The synthetic corpus
    * contains no natural PII, so (k1's synthesized-heavy-hitter pattern) a
    * deterministic doc_id-sliced injection adds an email to every 7th doc
    * and a phone token to every 11th on BOTH the Spark and oracle sides —
    * the extract/replace machinery is exercised on real nonzero matches,
    * not an always-empty corpus. Per-row regexp work is codegen'd and
    * shuffle-free; only the per-source rollup exchanges (|sources| rows).
    * At 100 TB this is one corpus pass, embarrassingly parallel. Regexes
    * avoid constructs where Java regex and DuckDB's RE2 diverge
    * (backreferences, lookaround): plain classes + \b only. */
  def y12PiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val withPii = t(spark, dir, "documents")
      .withColumn("pii_text", concat(
        col("text"),
        when(col("doc_id") % 7 === 0,
          concat(lit(" contact user"), col("doc_id"), lit("@example.com now")))
          .otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit(" today")))
          .otherwise(lit(""))))
    withPii
      .withColumn("n_emails",
        size(regexp_extract_all(col("pii_text"), lit(emailRe), lit(0))).cast("long"))
      .withColumn("n_phones",
        size(regexp_extract_all(col("pii_text"), lit(phoneRe), lit(0))).cast("long"))
      .withColumn("clean",
        regexp_replace(regexp_replace(col("pii_text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_emails") + col("n_phones") > 0, 1L).otherwise(0L)).as("pii_docs"),
        sum("n_emails").as("n_emails"),
        sum("n_phones").as("n_phones"),
        sum((length(col("pii_text")) - length(col("clean"))).cast("long")).as("chars_delta"))
      .orderBy("source")
  }

  /** y17: markup strip + entity decode — the Common-Crawl-style HTML
    * cleanup verb (extracted web text arrives with residual tags and
    * entities; dedupe and tokenization must see the rendered text). The
    * synthetic corpus has no markup, so (y12's pattern) every 7th doc
    * gains a deterministic tag+entity suffix on BOTH engines and the
    * strip runs against real matches. The tag regex `<[^>]*>` sits in the
    * Java-regex/RE2 common subset; entity decode is plain (non-regex)
    * replace with identical left-to-right semantics in both engines.
    * One codegen'd corpus pass; only the per-source rollup exchanges. */
  def y17MarkupStrip(spark: SparkSession, dir: String): DataFrame = {
    val aug = t(spark, dir, "documents")
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 7 === 0,
          lit(" <b>bold</b> &amp; <a href=\"x\">link</a>")).otherwise(lit(""))))
      .withColumn("clean",
        replace(regexp_replace(col("aug"), "<[^>]*>", ""), lit("&amp;"), lit("&")))
    aug.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("aug").rlike("<[^>]*>"), 1L).otherwise(0L)).as("marked_docs"),
        sum((length(col("aug")) - length(col("clean"))).cast("long")).as("chars_removed"))
      .orderBy("source")
  }

  /** y18: BM25 retrieval scoring — the lexical-ranking verb next to y15's
    * TF-IDF terms: the top-50 documents for a fixed 3-term query under
    * BM25 (k1=1.2, b=0.75), the scoring function retrieval-augmented data
    * curation and eval-set mining rank with. Log-free like y14/y15: the
    * idf factor stays the RATIONAL (N−df+0.5)/(df+0.5) (the monotone core
    * of the usual log idf — rank-preserving per term, and libm-free so
    * both engines agree bitwise). Term frequencies are exact space-padded
    * replace counts (tokenOcc — no split/explode, stays in codegen); dl
    * and Σdl are exact longs, so avgdl is ONE IEEE divide, and the score
    * is the same fixed expression tree of IEEE ops on both engines —
    * ranking happens on the RAW double (v1's discipline), round only on
    * output. Scale: per-doc scoring is a shuffle-free codegen'd
    * projection; the 1-row corpus stats (N, Σdl, 3 dfs) broadcast onto
    * the scan (PlanLint-whitelisted O(1) side); the only movement is the
    * TakeOrderedAndProject top-50. */
  def y18Bm25(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("spark", "join", "filter")
    val k1 = 1.2; val b = 0.75
    val docs = t(spark, dir, "documents")
      .select(col("doc_id") +: tokenCount(col("text")).as("dl") +:
        terms.map(tm => tokenOcc(col("text"), tm).as(s"tf_$tm")): _*)
    val aggs = count(lit(1)).as("n") +: sum(col("dl")).as("sdl") +:
      terms.map(tm =>
        sum(when(col(s"tf_$tm") > 0, 1L).otherwise(0L)).as(s"df_$tm"))
    val stats = docs.agg(aggs.head, aggs.tail: _*)
    val avgdl = col("sdl").cast("double") / col("n")
    val score = terms.map { tm =>
      val tf = col(s"tf_$tm").cast("double")
      val idf = (col("n").cast("double") - col(s"df_$tm") + 0.5) /
        (col(s"df_$tm").cast("double") + 0.5)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    docs.join(stats)
      .withColumn("raw", score)
      .orderBy(col("raw").desc, col("doc_id"))
      .limit(50)
      .select(col("doc_id"), col("dl"),
        round(col("raw"), 6).as("bm25"))
  }

  /** y16: Unicode NFC canonicalization rollup via the native
    * [[graft.functions.NfcNormalize]] expression — the text-cleaning step
    * that collapses decomposed combining sequences (OCR/PDF extraction
    * artifacts) to one canonical spelling before hashing or tokenizing.
    * The synthetic corpus is already NFC, so (y12's injection pattern) a
    * deterministic doc_id-sliced suffix adds a DECOMPOSED `e`+U+0301 to
    * every 3rd doc and a precomposed `é` to every (3k+1)th on BOTH
    * engines: the op is exercised on real compositions AND on
    * already-normal non-ASCII that must pass through untouched. Both
    * sides implement the same Unicode NFC and count codepoints, so
    * changed-doc counts and char deltas are exact. One codegen'd corpus
    * pass (the isNormalized fast path skips allocation on clean rows);
    * only the per-lang rollup exchanges. */
  def y16NfcClean(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.NfcNormalize.nfcNormalize
    val aug = t(spark, dir, "documents")
      .withColumn("aug", concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" cafe\u0301"))
          .when(col("doc_id") % 3 === 1, lit(" caf\u00e9"))
          .otherwise(lit(""))))
      .withColumn("nrm", nfcNormalize(col("aug")))
    aug.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("nrm") =!= col("aug"), 1L).otherwise(0L)).as("n_changed"),
        sum(length(col("aug")).cast("long")).as("chars_raw"),
        sum(length(col("nrm")).cast("long")).as("chars_nfc"))
      .orderBy("lang")
  }

  /** y21: corpus-version VOCABULARY DRIFT — the ingest-gate distribution
    * check a production pipeline runs before admitting a new crawl batch:
    * is the arriving slice (x11's `doc_id % 7 == 0` "new crawl"
    * convention) distributed like the standing corpus, and which tokens
    * moved most? Output: the 30 largest per-token probability shifts, as
    * exact occurrence counts on each side plus the shift in
    * parts-per-million. Log-free (the y14 rationale — no libm in the
    * oracle path): the p-shift is two single IEEE divisions of exact
    * longs and one subtraction, evaluation-ordered identically in the
    * oracle SQL, so the DOUBLE is bit-identical; ranking ties (possible
    * only after rounding) break on the unique token. Scale: the corpus
    * is TOKENIZED once (deriving the totals from the token aggregation
    * would recompute the whole explode+shuffle subtree — measured in the
    * first cut's plan); the totals side instead re-derives each side's
    * exact token count with [[tokenCount]]'s length arithmetic (tokens
    * per doc = spaces + 1 = `split` cardinality, trailing empties
    * included on both engines) — a second read of the text bytes but no
    * explode, no allocation, and a 1-row no-exchange aggregate. One
    * vocabulary-keyed exchange with map-side partial aggregation, a
    * 1-row totals broadcast (PlanLint's whitelisted shape), and the
    * top-30 plans as TakeOrderedAndProject — no global sort, no
    * unpartitioned window. Vocabulary-sized rows shuffle; document text
    * never does. */
  def y21CorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .withColumn("is_new", col("doc_id") % 7 === 0)
    val cf = docs
      .select(col("is_new"), explode(split(col("text"), " ")).as("tk"))
      .groupBy("tk").agg(
        sum(when(col("is_new"), 0L).otherwise(1L)).as("cf_old"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("cf_new"))
    val totals = docs.select(col("is_new"), tokenCount(col("text")).as("n"))
      .agg(sum(when(!col("is_new"), col("n")).otherwise(0L)).as("t_old"),
        sum(when(col("is_new"), col("n")).otherwise(0L)).as("t_new"))
    driftTop30(cf, totals)
  }

  /** y21's final assembly, shared verbatim by the batch form and its
    * streaming twin (st16) so the two can never diverge arithmetically:
    * `cf` is (tk, cf_old, cf_new), `totals` a 1-row (t_old, t_new). The
    * p-shift's two divides + subtract stay in this exact evaluation
    * order (the oracle mirrors it); (post-round) ranking ties break on
    * the unique token; the top-30 plans as TakeOrderedAndProject. */
  private[graft] def driftTop30(cf: DataFrame, totals: DataFrame): DataFrame =
    cf.join(broadcast(totals))
      .withColumn("drift_ppm",
        round(abs(col("cf_new").cast("double") / col("t_new") -
          col("cf_old").cast("double") / col("t_old")) * 1e6, 4))
      .select("tk", "cf_old", "cf_new", "drift_ppm")
      .orderBy(desc("drift_ppm"), asc("tk"))
      .limit(30)
}
