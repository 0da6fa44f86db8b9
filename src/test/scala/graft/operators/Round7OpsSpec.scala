package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Brute-force JVM oracles for the round-7 additions, on the sf0.001 corpus
 * (500 docs / ~1k events — exhaustive recomputation is cheap). These
 * complement the driver's DuckDB hash gate with in-repo evidence.
 */
class Round7OpsSpec extends SparkSpec {

  test("x14 substring spans equal a brute-force positional-gram scan") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // mirror the truncating-tail gram formula exactly, incl. split -1
    // (Spark's split keeps trailing empties) and the e = pos+7 convention
    // for sub-8-word docs
    val occ = docs.flatMap { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = math.max(toks.length - 7, 1)
      (0 until n).map(i => (id, i.toLong, toks.slice(i, i + 8).mkString(" ")))
    }
    val cnt = occ.groupBy(_._3).map { case (g, os) => (g, os.size) }
    val expected = occ.filter(o => cnt(o._3) >= 2)
      .groupBy(_._1).map { case (id, os) =>
        val ivs = os.map(o => (o._2, o._2 + 7)).sortBy(_._1)
        var pm = -1L; var spans = 0L; var words = 0L
        ivs.foreach { case (s, e) =>
          if (s > pm) spans += 1
          words += math.max(0L, e - math.max(s - 1, pm))
          pm = math.max(pm, e)
        }
        id -> (spans, words)
      }
    val got = DedupQueries.x14SubstringSpans(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "gate must bite: some doc has a duplicated span")
  }

  test("w6 funnel equals a brute-force per-user event walk") {
    val winUs = 3L * 86400L * 1000000L
    val events = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val perUser = events.groupBy(_._1).map { case (u, es) =>
      var fv = Option.empty[Long]; var fc = Option.empty[Long]; var fp = Option.empty[Long]
      var fvPrior = Option.empty[Long]; var fcPrior = Option.empty[Long]
      es.sortBy(e => (e._4, e._2)).foreach { case (_, _, tp, us) =>
        // qualification sees only STRICTLY PRIOR state (the ROWS frame)
        if (tp == "click" && fvPrior.exists(v => us - v <= winUs) && fc.isEmpty)
          fc = Some(us)
        if (tp == "purchase" && fcPrior.exists(c => us - c <= winUs) && fp.isEmpty)
          fp = Some(us)
        if (tp == "view") { if (fv.isEmpty) fv = Some(us); fvPrior = Some(fvPrior.fold(us)(math.min(_, us))) }
        if (tp == "click" && fc.contains(us)) fcPrior = Some(fcPrior.fold(us)(math.min(_, us)))
      }
      (u, fv, fc, fp)
    }.toSeq
    val r = AnalyticsQueries.w6Funnel(spark, sfDir).collect()(0)
    assert(r.getLong(0) == perUser.size)
    assert(r.getLong(1) == perUser.count(_._2.isDefined))
    assert(r.getLong(2) == perUser.count(_._3.isDefined))
    assert(r.getLong(3) == perUser.count(_._4.isDefined))
    val lags = perUser.collect { case (_, Some(v), Some(c), _) => c - v }
    // Spark round() = BigDecimal HALF_UP — recompute with the same mode
    val expAvg = BigDecimal(lags.sum.toDouble / lags.size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == expAvg)
    // stages must differentiate, or the funnel is a trivial pass
    assert(r.getLong(3) < r.getLong(2) && r.getLong(2) < r.getLong(1))
  }

  test("t3 cohort retention equals a brute-force per-user week walk") {
    val weekUs = 7L * 86400L * 1000000L
    val wk = Tables.t(spark, sfDir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), weekUs))).distinct
    val cohort = wk.groupBy(_._1).map { case (u, ws) => (u, ws.map(_._2).min) }
    val expected = wk.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, vs) => (k, vs.size.toLong) }
    val got = AnalyticsQueries.t3CohortRetention(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == expected)
    assert(got.keys.map(_._1).toSet.size > 1, "must produce multiple cohorts")
  }

  test("z4 split is complete, disjoint and per-source stratified") {
    val rows = TextQueries.z4StratifiedSplit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(rows.map(_._3).sum == total) // every doc in exactly one split
    val bySplit = rows.groupBy(_._2).map { case (s, rs) => (s, rs.map(_._3).sum) }
    // 80/10/10 within hash noise on 500 docs
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // deterministic: a rerun is identical
    val again = TextQueries.z4StratifiedSplit(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("t4 gap fill equals a brute-force grid + LOCF walk") {
    val hourUs = 3600L * 1000000L
    val rows = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / hourUs, r.getDouble(2)))
    val expected = rows.groupBy(_._1).flatMap { case (tp, es) =>
      val byHr = es.groupBy(_._2).map { case (hr, xs) =>
        // decimal(18,6) accumulate, order-independent like the query's sum
        hr -> (xs.size.toLong,
          xs.map(x => BigDecimal(x._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum.toDouble)
      }
      var locf = 0.0
      (byHr.keys.min to byHr.keys.max).map { hr =>
        val (n, hv) = byHr.getOrElse(hr, (0L, Double.NaN))
        if (n > 0) locf = hv
        (tp, hr, n, locf)
      }
    }.toSet
    val got = AnalyticsQueries.t4GapFill(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected)
    assert(got.exists(_._3 == 0L), "gate must bite: the grid has empty hours")
  }

  test("v10 ADC search equals a brute-force lookup-table top-k") {
    val (m, subDim) = (4, 16)
    val cents = SimilarityQueries.pqCodebooks(spark, sfDir)
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def jdot(q: Array[Float], off: Int, c: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += q(off + i).toDouble * c(i); i += 1 }
      acc
    }
    // encode: argmax of dot - 0.5*||c||² per subspace, lowest cell on ties
    val codes = vecs.map { case (id, v) =>
      id -> (0 until m).map { s =>
        cents(s).map { case (cell, c) =>
          (cell, jdot(v, s * subDim, c) - 0.5 * c.map(x => x * x).sum) }
          .maxBy { case (cell, sc) => (sc, -cell) }._1
      }
    }.toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val tables = (0 until m).map(s =>
        cents(s).map { case (cell, c) => cell -> jdot(qv, s * subDim, c) }.toMap)
      vecs.filter(_._1 != qid).map { case (nid, _) =>
        val s = (0 until m).map(x => tables(x)(codes(nid)(x))).reduce(_ + _)
        (qid, nid, s)
      }.sortBy { case (_, nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((q, n, s), i) =>
          (q, n, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            i + 1) }
    }.toSet
    val got = SimilarityQueries.v10PqAdcSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
    assert(got.size == 50)
  }

  test("y16 NFC composes decomposed sequences and only those") {
    import graft.functions.NfcNormalize.nfcNormalize
    import spark.implicits._
    val probe = Seq("café", "café", "plain ascii", "åb")
      .toDF("s").select(nfcNormalize(col("s")).as("n")).as[String].collect()
    assert(probe(0) == "café") // e + combining acute -> é
    assert(probe(1) == "café") // already NFC: untouched
    assert(probe(2) == "plain ascii")
    assert(probe(3) == "åb") // a + combining ring -> å
    val rows = TextQueries.y16NfcClean(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // every %3==0 doc gains exactly one composition: changed count and the
    // char delta are BOTH the per-lang count of that slice, nothing else
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "lang").collect().map(r => (r.getLong(0), r.getString(1)))
    val inj = docs.filter(_._1 % 3 == 0).groupBy(_._2).map { case (l, xs) => (l, xs.size.toLong) }
    rows.foreach { case (lang, _, nChanged, raw, nfc) =>
      assert(nChanged == inj.getOrElse(lang, 0L), s"$lang changed-count")
      assert(raw - nfc == nChanged, s"$lang delta is 1 codepoint per composition")
    }
    assert(rows.map(_._3).sum > 0)
  }

  test("z5 z-buckets pin the high nibbles: extents < 16 in BOTH dims") {
    val rows = LayoutOps.z5ZorderLayout(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = Tables.t(spark, sfDir, "lineitem").count()
    assert(rows.map(_._2).sum == total) // partition of the corpus
    rows.foreach { case (zb, _, qlo, qhi, dlo, dhi) =>
      // the ×5 quantity scaling (r9: z5 adopted the key z7's audit
      // measured as superior) pins a bucket's SCALED extent under 16,
      // so the raw quantity extent is ≤ 3 — vs 15 for the unscaled key
      assert(qhi - qlo <= 3, s"bucket $zb quantity extent")
      assert(dhi - dlo < 16, s"bucket $zb day extent")
    }
    assert(rows.length > 16, "grid is genuinely two-dimensional here")
  }

  test("v11 SQ8 search equals a brute-force integer-dot top-k and tracks v1") {
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dims = vecs.head._2.length
    val scales = (0 until dims).map(d => vecs.map(v => math.abs(v._2(d).toDouble)).max)
    val codes = vecs.map { case (id, v) =>
      id -> (0 until dims).map(d =>
        math.min(127L, math.max(-127L, math.floor(v(d).toDouble * 127 / scales(d)).toLong)))
    }.toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (qid, _) =>
      vecs.filter(_._1 != qid).map { case (nid, _) =>
        (qid, nid, (0 until dims).map(d => codes(qid)(d) * codes(nid)(d)).sum)
      }.sortBy { case (_, nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((q, n, s), i) => (q, n, s, i + 1) }
    }.toSet
    val got = SimilarityQueries.v11Sq8Search(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(got == expected)
    // quantization-fidelity contract: SQ8 keeps most of the exact top-5
    val exact = SimilarityQueries.v1CosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val overlap = got.count { case (q, n, _, _) => exact((q, n)) }
    assert(overlap >= 40, s"SQ8 recall@5 too low: $overlap/50")
  }

  test("t5 EWMA equals a brute-force dyadic-weight walk") {
    val hourUs = 3600L * 1000000L
    val rows = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getString(0), r.getLong(1) / hourUs))
    val expected = rows.groupBy(_._1).flatMap { case (tp, es) =>
      val byHr = es.groupBy(_._2).map { case (hr, xs) => hr -> xs.size.toLong }
      (byHr.keys.min to byHr.keys.max).map { hr =>
        val ewma = (0L to 31L).map { k =>
          byHr.getOrElse(hr - k, 0L).toDouble / (1L << (k + 1)) }.sum
        (tp, hr, byHr.getOrElse(hr, 0L), ewma)
      }
    }.toSet
    val got = AnalyticsQueries.t5EwmaSmooth(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected) // dyadic weights: EXACT double equality holds
  }

  test("y17 strip accounting matches the injected slice exactly") {
    val rows = TextQueries.y17MarkupStrip(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source").collect().map(r => (r.getLong(0), r.getString(1)))
    val inj = docs.filter(_._1 % 7 == 0).groupBy(_._2)
      .map { case (s, xs) => (s, xs.size.toLong) }
    // the suffix ' <b>bold</b> &amp; <a href="x">link</a>' loses its 3 tag
    // pairs (7+4+12 chars... measured: 27) and 4 entity chars per doc
    val suffix = " <b>bold</b> &amp; <a href=\"x\">link</a>"
    val cleaned = suffix.replaceAll("<[^>]*>", "").replace("&amp;", "&")
    val perDoc = (suffix.length - cleaned.length).toLong
    rows.foreach { case (src, _, marked, removed) =>
      assert(marked == inj.getOrElse(src, 0L), s"$src marked")
      assert(removed == marked * perDoc, s"$src chars_removed")
    }
    assert(rows.map(_._3).sum > 0)
  }

  test("j4 interval anti-join equals a brute-force per-view click scan") {
    val winUs = 3L * 86400L * 1000000L
    val weekUs = 604800L * 1000000L
    val ev = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val clicksByUser = ev.filter(_._1 == "click").groupBy(_._2)
      .map { case (u, xs) => u -> xs.map(_._3) }
    val views = ev.filter(_._1 == "view")
    val expected = views.groupBy(_._3 / weekUs).map { case (wk, vs) =>
      val unconv = vs.count { case (_, u, us) =>
        !clicksByUser.getOrElse(u, Array.empty[Long])
          .exists(c => c > us && c <= us + winUs) }
      (wk, vs.size.toLong, unconv.toLong)
    }.toSet
    val got = JoinQueries.j4IntervalAntiJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.exists(_._3 > 0), "gate must bite: some views never convert")
    assert(got.map { case (_, v, u) => v - u }.sum > 0, "and some do")
  }

  test("w7 basket pairs equal a brute-force per-order pair count") {
    val li = Tables.t(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val counts = li.groupBy(_._1).values.flatMap { xs =>
      val parts = xs.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (p, os) => (p._1, p._2, os.size.toLong) }
    val expected = counts.toSeq
      .sortBy { case (a, b, n) => (-n, a, b) }.take(20).toSet
    val got = AnalyticsQueries.w7BasketPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.exists(_._3 >= 2), "gate must bite: some pair repeats")
  }

  test("r4 pivot matrix row-sums equal the plain hourly counts") {
    val got = AnalyticsQueries.r4PivotMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), (1 to 5).map(r.getLong).sum))
    val hourly = Tables.t(spark, sfDir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got.toMap == hourly) // unpivoting the matrix recovers the rollup
    assert(got.map(_._2).sum == Tables.t(spark, sfDir, "events").count())
  }

  test("p3 CMS estimates equal a brute-force sketch and never undercount") {
    import graft.functions.CmsSketchAgg
    val (depth, width) = (4, 256)
    val keys = Tables.t(spark, sfDir, "lineitem")
      .select("l_partkey").collect().map(_.getLong(0))
    val sketch = new Array[Long](depth * width)
    keys.foreach(k => (0 until depth).foreach(r =>
      sketch(r * width + CmsSketchAgg.bucket(r, k, width)) += 1))
    val trueCounts = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    def est(k: Long): Long = (0 until depth)
      .map(r => sketch(r * width + CmsSketchAgg.bucket(r, k, width))).min
    // the CMS invariant over EVERY key, not just the reported ones
    trueCounts.foreach { case (k, n) => assert(est(k) >= n, s"undercount at $k") }
    val expected = trueCounts.toSeq.sortBy { case (k, n) => (-n, k) }.take(20)
      .map { case (k, n) => (k, n, est(k), est(k) - n) }.toSet
    val got = AnalyticsQueries.p3CmsTopk(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }

  test("m4 frame sampling equals the brute-force schedule walk") {
    val metas = MultimodalOps.decodeMeta(spark, sfDir).collect()
    val expected = metas.filter(_.durationMs > 0).groupBy(_.mediaType).map {
      case (tp, ms) =>
        val samples = ms.flatMap(m => (0L until m.durationMs by 500L).map(t => (m.docId, t)))
        (tp, ms.map(_.docId).distinct.length.toLong, samples.length.toLong,
          samples.map { case (id, t) => (id, t / 1000) }.distinct.length.toLong)
    }.toSet
    val got = MultimodalOps.mm4FrameSample(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("st11 stream-built CMS is cell-identical to the batch-built sketch") {
    import graft.functions.CmsSketchAgg
    val streamed = graft.streaming.EventStreamOps.streamUserCms(
      spark, s"$sfDir/events.parquet", s"st11spec_${System.nanoTime()}")
    val (depth, width) = (4, 256)
    val batch = new Array[Long](depth * width)
    Tables.t(spark, sfDir, "events").select("user_id").collect()
      .map(_.getLong(0)).foreach(k => (0 until depth).foreach(r =>
        batch(r * width + CmsSketchAgg.bucket(r, k, width)) += 1))
    assert(streamed == batch.toSeq)
  }

  test("r5 unpivot is the exact inverse of r4's pivot") {
    val matrix = AnalyticsQueries.r4PivotMatrix(spark, sfDir).collect()
    val long = AnalyticsQueries.r5Unpivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(long.length == matrix.length * 5) // every cell, zeros included
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rebuilt = long.groupBy(_._1).map { case (h, cells) =>
      (h, types.map(tp => cells.find(_._2 == tp).get._3))
    }
    matrix.foreach { r =>
      assert(rebuilt(r.getString(0)) == (1 to 5).map(r.getLong), r.getString(0))
    }
  }

  test("g2 ranged read equals substring and genuinely crosses chunk boundaries") {
    import graft.core.{Chunker, DedupeSettings}
    val s = DedupeSettings(256, 2048, 8, 1)
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.map { case (id, text) =>
      val n = text.getBytes("UTF-8").length
      (id, text.substring(n / 3, math.min(n / 3 + 200, n)))
    }.toMap
    val got = ChunkQueries.g2RangedRead(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == expected)
    // the range must span >= 2 chunks somewhere, else pruning is untested
    val multi = docs.count { case (_, text) =>
      val bytes = text.getBytes("UTF-8")
      val off = bytes.length / 3
      val end = math.min(off + 200, bytes.length)
      Chunker.chunk(bytes, s).count(c =>
        c.address + c.length > off && c.address < end) >= 2
    }
    assert(multi > 0, "no document's range crosses a chunk boundary")
  }

  test("v12 IVFADC equals the cell-restricted brute-force ADC top-k") {
    val (m, subDim) = (4, 16)
    val cents = SimilarityQueries.pqCodebooks(spark, sfDir)
    val cells = SimilarityQueries.kmeansAssigned(spark, sfDir, 10, 3)
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def jdot(q: Array[Float], off: Int, c: Seq[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += q(off + i).toDouble * c(i); i += 1 }
      acc
    }
    val codes = vecs.map { case (id, v) =>
      id -> (0 until m).map { s =>
        cents(s).map { case (cell, c) =>
          (cell, jdot(v, s * subDim, c) - 0.5 * c.map(x => x * x).sum) }
          .maxBy { case (cell, sc) => (sc, -cell) }._1
      }
    }.toMap
    val expected = vecs.filter(_._1 < 10).flatMap { case (qid, qv) =>
      val tables = (0 until m).map(s =>
        cents(s).map { case (cell, c) => cell -> jdot(qv, s * subDim, c) }.toMap)
      vecs.filter(v => v._1 != qid && cells(v._1) == cells(qid)) // the probe
        .map { case (nid, _) =>
          (qid, nid, (0 until m).map(x => tables(x)(codes(nid)(x))).reduce(_ + _))
        }.sortBy { case (_, nid, s) => (-s, nid) }.take(5).zipWithIndex
        .map { case ((q, n, s), i) =>
          (q, n, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
            i + 1) }
    }.toSet
    val got = SimilarityQueries.v12IvfAdc(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("event ts normalization reads every physical encoding identically") {
    // the driver has shipped events.ts as BOTH int64-nanos and
    // timestamp[us] across testdata regenerations; Tables.normalizeEventTs
    // must make the generations indistinguishable
    val now = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val d = java.nio.file.Files.createTempDirectory("graft-nanos")
    graft.core.FsUtil.deleteOnExitRecursively(d)
    // legacy generation: the same events re-encoded as plain int64 nanos
    Tables.t(spark, sfDir, "events")
      .select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val legacy = Tables.t(spark, d.toString, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(legacy == now)
    // already-TIMESTAMP frames pass through normalize untouched
    val again = Tables.normalizeEventTs(Tables.t(spark, sfDir, "events"))
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(again == now)
  }

  test("st10 streaming admit equals the batch run of the same gate") {
    val batch = TextQueries.st10AdmitGate(
      Tables.t(spark, sfDir, "documents").filter(col("doc_id") % 7 === 0),
      Tables.t(spark, sfDir, "documents").filter(col("doc_id") % 7 =!= 0))
      .collect().map(_.toSeq).toSet
    val streamed = graft.streaming.EventStreamOps.runDocAppend(spark, sfDir,
      s"st10spec_${System.nanoTime()}",
      _.filter(col("doc_id") % 7 === 0),
      docs => TextQueries.st10AdmitGate(docs,
        Tables.t(docs.sparkSession, sfDir, "documents").filter(col("doc_id") % 7 =!= 0)))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(batch.nonEmpty)
  }
}
