package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic properties of the Spark-only queries (the ones the DuckDB
  * oracle cannot check): sketch error bounds and ANN sanity. */
class QueryPropertiesSpec extends SparkSpec {

  test("q6 approximate distinct counts stay within the configured rsd") {
    AnalyticsQueries.q6ApproxDistinct(spark, sfDir).collect().foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.1,
        s"flag ${r.getString(0)}: approx $approx vs exact $exact drifted > 10%")
    }
  }

  test("v4 IVF probe returns self-cell neighbors with sane similarity order") {
    val rows = SimilarityQueries.v4IvfSearch(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getInt(4)).map(_.getDouble(3))
      assert(sims.sameElements(sims.sorted.reverse), "rank must follow sim desc")
    }
  }

  test("x6 embedding-cosine finds every exact-duplicate text pair at cosine 1") {
    val dupDir = "/root/testdata/sf0.1" // smaller SFs have no exact-dup docs
    val docs = Tables.t(spark, dupDir, "documents")
      .select(col("doc_id"), sha2(col("text").cast("binary"), 256).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val exactPairs = docs.groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    assert(exactPairs.nonEmpty, "corpus should contain exact duplicates")
    val found = DedupQueries.x6EmbeddingCosine(spark, dupDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    exactPairs.foreach { p =>
      assert(found.get(p).exists(_ >= 0.9999),
        s"exact duplicate pair $p missing or cosine != 1")
    }
  }

  test("p2 approx percentiles stay within the sketch's rank-error envelope") {
    val exact = AnalyticsQueries.p1Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    AnalyticsQueries.p2ApproxPercentiles(spark, sfDir).collect().foreach { r =>
      val flag = r.getString(0)
      val approx = Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))
      val (e25, e50, e75, ePrice) = exact(flag)
      // accuracy=1000 bounds rank error at 1/1000 of the group; quantity is
      // a narrow integer-ish domain, so value drift must stay tiny
      for (((a, e), q) <- approx.zip(Seq(e25, e50, e75)).zip(Seq(25, 50, 75)))
        assert(math.abs(a - e) <= math.max(1.0, 0.02 * math.abs(e)),
          s"flag $flag q$q: approx $a vs exact $e drifted beyond the envelope")
      assert(math.abs(r.getDouble(5) - ePrice) <= 0.05 * math.abs(ePrice),
        s"flag $flag price median: approx ${r.getDouble(5)} vs exact $ePrice")
    }
  }

  test("x8 contamination equals a brute-force shingle-intersection count") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), DedupQueries.shingleHashes(r.getString(1)).toSet))
    val eval = docs.filter(_._1 % 50 == 0)
    val train = docs.filter(_._1 % 50 != 0)
    val expected = (for {
      (tid, ts) <- train
      (eid, es) <- eval
      n = ts.intersect(es).size
      if n >= 3
    } yield ((tid, eid), n.toLong)).toMap
    val got = DedupQueries.x8Contamination(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got === expected, "operator must equal the brute-force overlap count")
    assert(expected.nonEmpty, "corpus must exercise the contamination path")
  }

  test("x12 bloom-prefiltered decontamination is bit-identical to x8") {
    // the bloom prefilter must be semantically transparent: no false
    // negatives (sketch contract) and the exact join removes false
    // positives, so the two plans must agree row-for-row
    val x8 = DedupQueries.x8Contamination(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val x12 = DedupQueries.x12BloomDecontamination(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(x12 === x8, "bloom path must not change the contamination answer")
    assert(x8.nonEmpty, "corpus must exercise the contamination path")
  }

  test("x13 semantic dedupe verdicts are internally consistent and bite") {
    val rows = SimilarityQueries.x13SemanticDedup(spark, sfDir).collect()
    val dropped = rows.filter(_.getLong(2) == 0L)
    assert(dropped.nonEmpty, "τ must bite on this corpus or the op is vacuous")
    dropped.foreach { r =>
      assert(!r.isNullAt(3) && r.getLong(3) < r.getLong(0),
        "evidence must be a LOWER-id cell-mate (keep-first order)")
      assert(r.getDouble(4) > 0.35, "dropped rows must exceed the threshold")
    }
    rows.filter(_.getLong(2) == 1L).foreach { r =>
      assert(r.isNullAt(3) && r.isNullAt(4), "kept rows carry no dup evidence")
    }
  }

  test("y14 unigram typicality equals a brute-force frequency count") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ")))
    val cf = docs.flatMap(_._3).groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val perDoc = docs.map { case (_, lang, toks) =>
      (lang, toks.length.toLong, toks.map(cf).sum)
    }
    val gs = perDoc.map(_._3).sum
    val gn = perDoc.map(_._2).sum
    val expected = perDoc.groupBy(_._1).map { case (lang, rows) =>
      val flagged = rows.count { case (_, n, s) => 100L * s * gn < 97L * gs * n }
      val s = rows.map(_._3).sum; val n = rows.map(_._2).sum
      (lang, (rows.size.toLong, flagged.toLong,
        BigDecimal(s.toDouble / n).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = TextQueries.y14UnigramTypicality(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got === expected, "operator must equal the brute-force typicality rollup")
    assert(expected.values.map(_._2).sum > 0, "corpus must flag at least one atypical doc")
  }

  test("v9 product quantization emits valid codes and lossy-but-close sims") {
    val rows = SimilarityQueries.v9ProductQuantization(spark, sfDir).collect()
    assert(rows.length == 500)
    val codes = rows.flatMap(r => Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(codes.forall(c => c >= 0 && c < 4), "codes index the k=4 subspace centroids")
    assert(codes.distinct.length > 1, "a degenerate one-cell quantizer compresses nothing")
    rows.foreach { r =>
      val sim = r.getDouble(5)
      // unit-norm vectors: the additive reconstruction sim is bounded by 1
      // (up to rounding) and a sane quantizer keeps most of the norm
      assert(sim <= 1.000001, s"vec ${r.getLong(0)}: recon_sim $sim > 1")
    }
    // this corpus' vectors are near-random unit vectors: a 4-centroid
    // 16-dim subspace quantizer retains only a thin slice of the norm
    // (~0.11 mean here; real clustered embeddings retain far more). The
    // bound guards against a broken/zeroed quantizer, not compression
    // quality on random data.
    val mean = rows.map(_.getDouble(5)).sum / rows.length
    assert(mean > 0.05, s"mean recon_sim $mean — quantizer lost nearly all signal")
  }

  test("y7 hash sample is deterministic and matches a JVM md5 of the id") {
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 4), 16) % 10
    }
    val all = Tables.t(spark, sfDir, "documents").select("doc_id")
      .collect().map(_.getLong(0))
    val expected = all.filter(bucket(_) < 2).sorted
    val got = TextQueries.y7HashSample(spark, sfDir).collect().map(_.getLong(0))
    assert(got.toSeq === expected.toSeq, "slice membership must be exactly md5-derived")
    // stable across runs (no RNG anywhere)
    val again = TextQueries.y7HashSample(spark, sfDir).collect().map(_.getLong(0))
    assert(again.toSeq === got.toSeq)
    val ratio = got.length.toDouble / all.length
    assert(ratio > 0.1 && ratio < 0.3, s"~20% slice expected, got $ratio")
  }

  test("y8 repetition ratio equals a brute-force shingle count per lang") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("lang"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Seq[String] = {
      val toks = text.split(' ').toSeq
      val n = math.max(toks.length - 2, 1)
      (0 until n).map(i => toks.slice(i, i + 3).mkString(" "))
    }
    val perDoc = docs.map { case (lang, text) =>
      val sh = shingles(text)
      val ratio = (sh.size - sh.distinct.size).toDouble / sh.size
      (lang, BigDecimal(ratio).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val expected = perDoc.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.count(_._2 > 0.2).toLong,
        rs.map(_._2).max)
    }.toMap
    val got = TextQueries.y8Repetition(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    for ((lang, (n, flagged, maxR)) <- expected) {
      val (gn, gf, gm) = got(lang)
      assert(gn === n, s"$lang doc count")
      assert(gf === flagged, s"$lang flagged count")
      assert(math.abs(gm - maxR) < 1e-9, s"$lang max ratio")
    }
  }

  test("y10 mixture resample matches a JVM md5 acceptance test per language") {
    def hash32(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 8), 16)
    }
    val docs = Tables.t(spark, sfDir, "documents").select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val target = counts.values.min
    val expected = docs.filter { case (id, lang) =>
      hash32(id) * counts(lang) < target * 4294967296L
    }.map(_._1).sorted
    val got = TextQueries.y10MixtureResample(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSeq === expected.toSeq,
      "sampled membership must be exactly the integer md5 acceptance set")
    // every language lands close to the shared target (hash uniformity)
    got.groupBy(_.getString(1)).foreach { case (lang, rs) =>
      assert(math.abs(rs.length - target) <= math.max(4L, target / 2),
        s"$lang sampled ${rs.length} vs target $target — acceptance rate is off")
      assert(rs.head.getLong(3) === target)
    }
  }

  test("y11 lexical diversity equals a brute-force type/token count") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).view.mapValues { rs =>
      // split with limit -1: keep trailing empty tokens, matching Spark's
      // split() and the space-count arithmetic (split(Char) drops them)
      val toks = rs.flatMap(_._2.split(" ", -1))
      (toks.length.toLong, toks.distinct.length.toLong)
    }.toMap
    val got = TextQueries.y11LexicalDiversity(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, (total, distinct)) <- expected) {
      val (gt, gd, ttr) = got(src)
      assert(gt === total, s"$src total tokens")
      assert(gd === distinct, s"$src distinct tokens")
      assert(ttr > 0.0 && ttr <= 1.0, s"$src ttr out of range: $ttr")
    }
  }

  test("y12 pii scrub equals a brute-force regex count/redact pass") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val email = TextQueries.emailRe.r
    val phone = TextQueries.phoneRe.r
    val expected = docs.groupBy(_._2).view.mapValues { rs =>
      val per = rs.map { case (id, _, text) =>
        val pii = text +
          (if (id % 7 == 0) s" contact user$id@example.com now" else "") +
          (if (id % 11 == 0) f" call 555-${id % 10000}%04d today" else "")
        val ne = email.findAllIn(pii).length
        val np = phone.findAllIn(pii).length
        val clean = phone.replaceAllIn(email.replaceAllIn(pii, "<EMAIL>"), "<PHONE>")
        (ne.toLong, np.toLong, (pii.length - clean.length).toLong)
      }
      (per.length.toLong, per.count(p => p._1 + p._2 > 0).toLong,
        per.map(_._1).sum, per.map(_._2).sum, per.map(_._3).sum)
    }.toMap
    val got = TextQueries.y12PiiScrub(spark, sfDir).collect().map(r =>
      r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, exp) <- expected) assert(got(src) === exp, s"source $src")
    // the injection must actually exercise the scrubber on this corpus
    assert(expected.values.map(_._3).sum > 0, "no emails injected — dead test")
    assert(expected.values.map(_._4).sum > 0, "no phones injected — dead test")
  }

  test("y13 source cap equals a brute-force per-source top-k by quality") {
    val cap = 15
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def occurrences(text: String, word: String): Long = {
      val padded = " " + text + " "
      ((padded.length - padded.replace(s" $word ", " ").length) / (word.length + 1)).toLong
    }
    val expected = docs.groupBy(_._2).view.mapValues { rs =>
      val scored = rs.map { case (id, _, text) =>
        val toks = text.count(_ == ' ').toLong + 1
        val hits = occurrences(text, "the") + occurrences(text, "a")
        val score = java.math.BigDecimal.valueOf(hits.toDouble / toks)
          .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
        (id, toks, score)
      }
      val ranked = scored.sortBy { case (id, _, s) => (-s, id) }
      val kept = ranked.take(cap)
      (ranked.length.toLong, kept.length.toLong, (ranked.length - kept.length).toLong,
        kept.map(_._2).sum)
    }.toMap
    val got = TextQueries.y13SourceCap(spark, sfDir).collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, exp) <- expected) assert(got(src) === exp, s"source $src")
    // the cap must actually bite on this corpus, or the test proves nothing
    assert(expected.values.exists(_._3 > 0), "no source exceeds the cap — dead test")
  }

  test("z3 sequence packing equals a brute-force concat-and-chop pass") {
    val cap = 2048L
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // brute force: walk docs in order, chop the running token offset
    var off = 0L
    val perSeq = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
    for ((_, text) <- docs) {
      val toks = text.count(_ == ' ').toLong + 1 // whitespace tokens: spaces + 1
      val (strt, fin) = (off, off + toks)
      var s = strt / cap
      while (s <= (fin - 1) / cap) {
        val (n, carried, fill) = perSeq.getOrElse(s, (0L, 0L, 0L))
        perSeq(s) = (n + 1,
          carried + (if (strt < s * cap) 1L else 0L),
          fill + (math.min(fin, (s + 1) * cap) - math.max(strt, s * cap)))
        s += 1
      }
      off = fin
    }
    val got = TextQueries.z3SequencePack(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === perSeq.keySet)
    for ((seq, exp) <- perSeq) assert(got(seq) === exp, s"seq $seq")
    // every sequence except the last must be filled exactly to capacity
    val last = perSeq.keys.max
    for ((seq, (_, _, fill)) <- perSeq if seq != last)
      assert(fill == cap, s"seq $seq underfilled: $fill")
  }

  test("x9 common spans equals a brute-force document-frequency top-k") {
    val docs = Tables.t(spark, sfDir, "documents").select("text")
      .collect().map(_.getString(0))
    def shingles(text: String): Seq[String] = {
      // limit -1 keeps trailing empty tokens, matching Spark's split()
      val toks = text.split(" ", -1).toSeq
      val n = math.max(toks.length - 2, 1)
      (0 until n).map(i => toks.slice(i, i + 3).mkString(" "))
    }
    val docFreq = docs.flatMap(t => shingles(t).distinct)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = docFreq.toSeq.sortBy { case (s, f) => (-f, s) }.take(20)
    val got = DedupQueries.x9CommonSpans(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected, "top-20 spans by doc frequency must match brute force")
  }

  test("x10 dedupe keep-table is consistent with x7's cluster labels") {
    val labels = DedupQueries.x7DupClusters(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val keep = DedupQueries.x10DedupKeep(spark, sfDir).collect()
    // one row per distinct cluster, keeper IS the min-label cluster id
    assert(keep.map(_.getLong(0)).toSet === labels.map(_._2).toSet)
    keep.foreach { r =>
      assert(r.getLong(2) === r.getLong(0), "keep_doc_id must equal cluster_id (min label)")
      assert(r.getLong(3) === r.getLong(1) - 1, "n_removed = n_members - 1")
      assert(r.getLong(1) >= 2, "a cluster implies at least one near-dup pair")
    }
    assert(keep.map(_.getLong(1)).sum === labels.length.toLong,
      "cluster members must partition the labeled docs")
  }

  test("z1 curation survivors reconcile with the three component filters") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dropped = DedupQueries.x7DupClusters(spark, sfDir).collect()
      .filter(r => r.getLong(0) != r.getLong(1)).map(_.getLong(0)).toSet
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def stopRatio(text: String): Double = {
      val padded = s" $text "
      def hits(w: String) =
        (padded.length - padded.replace(s" $w ", " ").length) / (w.length + 1)
      val nTokens = text.count(_ == ' ') + 1
      round4((hits("the") + hits("a")).toDouble / nTokens)
    }
    def repRatio(text: String): Double = {
      val toks = text.split(" ", -1).toSeq
      val n = math.max(toks.length - 2, 1)
      val sh = (0 until n).map(i => toks.slice(i, i + 3).mkString(" "))
      round4((sh.size - sh.distinct.size).toDouble / sh.size)
    }
    val expected = docs.groupBy(_._2).view.mapValues { rs =>
      val kept = rs.filter { case (id, _, text) =>
        stopRatio(text) >= 0.05 && repRatio(text) <= 0.2 && !dropped(id)
      }
      (rs.length.toLong, kept.length.toLong,
        kept.map { case (_, _, t) => (t.count(_ == ' ') + 1).toLong }.sum)
    }.toMap
    val got = DedupQueries.z1CurationSurvivors(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, exp) <- expected)
      assert(got(src) === exp, s"$src (n_docs, kept_docs, kept_tokens)")
  }

  test("z2 incremental curation reconciles with x11 verdicts + the text gates") {
    val newDocs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .filter(_._1 % 7 == 0)
    val keep = DedupQueries.x11IncrementalDedup(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def round4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def stopRatio(text: String): Double = {
      val padded = s" $text "
      def hits(w: String) =
        (padded.length - padded.replace(s" $w ", " ").length) / (w.length + 1)
      round4((hits("the") + hits("a")).toDouble / (text.count(_ == ' ') + 1))
    }
    def repRatio(text: String): Double = {
      val toks = text.split(" ", -1).toSeq
      val n = math.max(toks.length - 2, 1)
      val sh = (0 until n).map(i => toks.slice(i, i + 3).mkString(" "))
      round4((sh.size - sh.distinct.size).toDouble / sh.size)
    }
    val expected = newDocs.groupBy(_._2).view.mapValues { rs =>
      val admitted = rs.filter { case (id, _, text) =>
        stopRatio(text) >= 0.05 && repRatio(text) <= 0.2 && keep(id) == 1L
      }
      (rs.length.toLong, admitted.length.toLong,
        admitted.map { case (_, _, t) => (t.count(_ == ' ') + 1).toLong }.sum)
    }.toMap
    val got = DedupQueries.z2IncrementalCuration(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === expected.keySet)
    for ((src, exp) <- expected)
      assert(got(src) === exp, s"$src (n_new_docs, admitted_docs, admitted_tokens)")
  }

  test("y21 drift rows re-derive exactly from independent token counts") {
    // independent recomputation: per-side totals from the corpus, per-token
    // counts for the returned tokens, then the same two-divide arithmetic —
    // every output cell must reproduce, and the top-30 must really be the
    // global maximum drift (no row outside the cut may exceed the cut's min)
    val docs = Tables.t(spark, sfDir, "documents")
      .select((col("doc_id") % 7 === 0).as("is_new"),
        explode(split(col("text"), " ")).as("tk"))
      .groupBy("tk").agg(
        sum(when(col("is_new"), 0L).otherwise(1L)).as("o"),
        sum(when(col("is_new"), 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val tOld = docs.valuesIterator.map(_._1).sum
    val tNew = docs.valuesIterator.map(_._2).sum
    def ppm(cf: (Long, Long)): Double = BigDecimal(
      math.abs(cf._2.toDouble / tNew - cf._1.toDouble / tOld) * 1e6)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val out = TextQueries.y21CorpusDrift(spark, sfDir).collect()
    assert(out.length == 30)
    out.foreach { r =>
      val (o, n) = docs(r.getString(0))
      assert(r.getLong(1) == o && r.getLong(2) == n,
        s"token '${r.getString(0)}' counts diverge")
      assert(r.getDouble(3) == ppm((o, n)),
        s"token '${r.getString(0)}' drift_ppm diverges")
    }
    val cutMin = out.map(_.getDouble(3)).min
    val returned = out.map(_.getString(0)).toSet
    val excludedMax = docs.iterator.filterNot(kv => returned(kv._1))
      .map(kv => ppm(kv._2)).max
    assert(excludedMax <= cutMin,
      s"a token outside the top-30 drifts more ($excludedMax > $cutMin)")
  }

  test("v4 IVF probes exactly one cell per query and never returns self") {
    // (this corpus' embeddings are near-random — within-label cosine ~0.004
    // vs ~-0.001 across — so recall vs brute force is a data property, not
    // an operator property; what IS invariant: single-cell probes, no
    // self-matches, at most k results per query)
    val rows = SimilarityQueries.v4IvfSearch(spark, sfDir).collect()
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(2)).distinct.length == 1,
        s"query $q probed more than one cell")
      assert(rs.forall(_.getLong(1) != q), s"query $q returned itself")
      assert(rs.length <= 3)
    }
  }
}
