package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Brute-force JVM oracles for the late round-7 additions (k2/t6/w8/m5) on
 * the sf0.001 corpus, plus the plan-level assertion that k2's AQE skew
 * split actually fires — complementing the driver's DuckDB hash gate.
 */
class Round7bOpsSpec extends SparkSpec {

  import spark.implicits._

  test("k2: AQE skew session splits the hot partition AND output equals the plain join") {
    // synthetic skew big enough to cross the lowered 64 KiB threshold:
    // ~90% of 200k fact rows share key 1
    val child = SkewOps.aqeSkewSession(spark)
    val fact = child.range(0, 200000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 64).as("c_custkey"),
        (col("id") % 97).cast("double").as("value"))
    val dim = child.range(0, 64)
      .select(col("id").as("c_custkey"),
        concat(lit("seg"), (col("id") % 5)).as("c_mktsegment"))
    val skewed = SkewOps.aqeSkewRollup(fact, dim)
    val got = skewed.collect().map(r =>
      (r.getString(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
    // AQE final plan must contain a skew-split marker (the whole point)
    val plan = skewed.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("skew"),
      s"expected a skew-split marker in the executed plan:\n$plan")
    // plain rollup on the PARENT session (default planning) for the oracle
    val pf = spark.range(0, 200000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 64).as("c_custkey"),
        (col("id") % 97).cast("double").as("value"))
    val pd = spark.range(0, 64)
      .select(col("id").as("c_custkey"),
        concat(lit("seg"), (col("id") % 5)).as("c_mktsegment"))
    val want = SkewOps.aqeSkewRollup(pf, pd).collect().map(r =>
      (r.getString(0), r.getBoolean(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._2), "the hot key must appear in the rollup")
  }

  test("t6 anomaly flags equal a brute-force BigDecimal window walk") {
    val dayUs = 86400L * 1000000L
    val rows = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / dayUs, r.getDouble(2)))
    // daily decimal(18,6) totals (HALF_UP cast like both engines)
    val daily = rows.groupBy(t => (t._1, t._2)).map { case ((ty, day), es) =>
      val x = es.map(e => BigDecimal(e._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      (ty, day, x)
    }.toSeq.sortBy(t => (t._1, t._2))
    val expected = daily.groupBy(_._1).flatMap { case (ty, ds) =>
      val sorted = ds.sortBy(_._2)
      sorted.zipWithIndex.map { case ((_, day, x), i) =>
        val win = sorted.slice(math.max(0, i - 7), i).map(_._3)
        val s = win.sum
        val ss = win.map(v => v * v).sum
        val dev = x * 7 - s
        val flag = win.size == 7 && dev * dev * 3 > (ss * 7 - s * s) * 14
        (ty, day) -> (x.toDouble, win.size.toLong, flag)
      }
    }
    val got = AnalyticsQueries.t6AnomalyFlags(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(got == expected)
    assert(got.values.exists(_._3), "some day should be flagged anomalous")
    assert(got.values.forall(v => v._2 == 7 || !v._3),
      "no flag may fire on a partial window")
  }

  test("w8 attribution equals a brute-force per-purchase touch scan") {
    val events = Tables.t(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val lookback = 3L * 86400L * 1000000L
    val touches = events.filter(e => e._4 == "click" || e._4 == "view")
      .groupBy(_._2).view.mapValues(_.toSeq).toMap
    val perPurchase = events.filter(_._4 == "purchase").map { p =>
      val w = touches.getOrElse(p._2, Seq.empty)
        .filter(t => t._3 < p._3 && t._3 >= p._3 - lookback)
      val first = if (w.isEmpty) "direct" else w.minBy(t => (t._3, t._1))._4
      val last = if (w.isEmpty) "direct" else w.maxBy(t => (t._3, t._1))._4
      (p._5, first, last)
    }
    def dec(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val channels = (perPurchase.map(_._2) ++ perPurchase.map(_._3)).distinct.sorted
    val expected = channels.map { ch =>
      val f = perPurchase.filter(_._2 == ch)
      val l = perPurchase.filter(_._3 == ch)
      (ch, f.size.toLong, f.map(p => dec(p._1)).sum.toDouble,
        l.size.toLong, l.map(p => dec(p._1)).sum.toDouble)
    }
    val got = AnalyticsQueries.w8Attribution(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected.toSeq)
    assert(got.exists(_._1 == "direct"), "some purchase should be unattributed")
  }

  test("m5 multimodal pack equals a serial pack walk and conserves tokens") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val budgets = docs.map { case (id, text) =>
      val m = MultimodalOps.stubDecode(id, text.getBytes("UTF-8"))
      val textToks = 1L + text.count(_ == ' ')
      val mediaToks =
        if (m.durationMs > 0) (m.durationMs - 1) / 500 + 1
        else ((m.width + 15L) / 16) * ((m.height + 15L) / 16)
      (id, textToks, mediaToks)
    }
    val cap = 4096L
    var off = 0L
    case class Acc(nDocs: Long = 0, nCarried: Long = 0, text: Long = 0, media: Long = 0)
    val acc = scala.collection.mutable.Map.empty[Long, Acc]
    budgets.foreach { case (_, tt, mt) =>
      val strt = off; val tmid = strt + tt; val fin = tmid + mt
      (strt / cap to (fin - 1) / cap).foreach { s =>
        val lo = s * cap; val hi = (s + 1) * cap
        val a = acc.getOrElse(s, Acc())
        acc(s) = Acc(a.nDocs + 1, a.nCarried + (if (strt < lo) 1 else 0),
          a.text + math.max(0L, math.min(tmid, hi) - math.max(strt, lo)),
          a.media + math.max(0L, math.min(fin, hi) - math.max(tmid, lo)))
      }
      off = fin
    }
    val got = MultimodalOps.mm5MultimodalPack(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = acc.toSeq.sortBy(_._1).map { case (s, a) =>
      s -> (a.nDocs, a.nCarried, a.text, a.media, a.text + a.media) }
    assert(got.toSeq == expected)
    // conservation + capacity: every sequence except the last is full
    val total = budgets.map(b => b._2 + b._3).sum
    assert(got.map(_._2._5).sum == total)
    assert(got.dropRight(1).forall(_._2._5 == cap))
  }

  private def collectedEvents() = Tables.t(spark, sfDir, "events")
    .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
      col("event_type"), col("value")).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))

  test("t7 seasonal residual equals a brute-force dow-baseline walk") {
    val dayUs = 86400L * 1000000L
    def dec(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val daily = collectedEvents().groupBy(e => (e._4, e._3 / dayUs))
      .map { case ((ty, day), es) => (ty, day, es.map(e => dec(e._5)).sum) }.toSeq
    val base = daily.groupBy(d => (d._1, d._2 % 7)).map { case (k, ds) =>
      k -> (ds.map(_._3).sum.toDouble / ds.size) }
    val expected = daily.sortBy(d => (d._1, d._2)).map { case (ty, day, x) =>
      val b = base((ty, day % 7))
      (ty, day, x.toDouble, b, x.toDouble - b)
    }
    val got = AnalyticsQueries.t7SeasonalResidual(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == expected)
    assert(got.exists(_._5 != 0.0), "some day must deviate from its baseline")
  }

  test("w9 transition matrix equals a brute-force per-user walk") {
    val gapUs = 30L * 60L * 1000000L
    val pairs = collectedEvents().groupBy(_._2).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._3, e._1))
      s.zip(s.drop(1)).collect {
        case (a, b) if b._3 - a._3 <= gapUs => (a._4, b._4)
      }
    }
    val n = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = n.toSeq.sortBy(_._1).map { case ((f, t), c) =>
      (f, t, c, c.toDouble / fromTotals(f)) }
    val got = AnalyticsQueries.w9TransitionMatrix(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == expected)
    // shares out of each from_type must sum to 1 exactly in rational terms
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    }
  }

  test("j5 nearest join equals a brute-force bidirectional scan") {
    val horizon = 86400L * 1000000L
    val es = collectedEvents()
    val clicks = es.filter(_._4 == "click").groupBy(_._2)
    val expected = es.filter(_._4 == "purchase").flatMap { p =>
      val cand = clicks.getOrElse(p._2, Array.empty[(Long, Long, Long, String, Double)])
        .filter(c => math.abs(c._3 - p._3) <= horizon)
      if (cand.isEmpty) None
      else {
        val best = cand.minBy(c => (math.abs(c._3 - p._3), c._1))
        Some((p._1, p._2, best._1, best._3 - p._3))
      }
    }.sortBy(_._1)
    val got = JoinQueries.j5NearestJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    assert(got.exists(_._4 < 0) && got.exists(_._4 > 0),
      "nearest picks must occur in both directions")
  }

  test("p4 histogram equals a brute-force bucket walk") {
    def dec(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val rows = collectedEvents().map(e =>
      (e._4, math.min(math.floor(e._5 / 50.0).toLong, 9L), e._5))
    val expected = rows.groupBy(r => (r._1, r._2)).toSeq.sortBy(_._1)
      .map { case ((ty, b), es) =>
        (ty, b, b * 50L, es.size.toLong, es.map(e => dec(e._3)).sum.toDouble) }
    val got = AnalyticsQueries.p4Histogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == expected)
    // exact mass conservation across bins
    assert(math.abs(got.map(_._5).sum -
      rows.map(r => dec(r._3)).sum.toDouble) < 1e-6)
  }

  test("z6 shard binpack equals a serial per-source walk and conserves chars") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      var off = 0L
      ds.sortBy(_._1).map { case (id, _, n) =>
        val shard = off / 50000L; off += n; (src, shard, id, n)
      }
    }.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1).map { case ((src, sh), ds) =>
      (src, sh, ds.size.toLong, ds.map(_._4).sum, ds.map(_._3).min, ds.map(_._3).max)
    }
    val got = LayoutOps.z6ShardBinpack(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected)
    assert(got.map(_._4).sum == docs.map(_._3).sum, "every char lands in a shard")
  }

  test("x15 bucket profile matches the banding it profiles, and prices the join") {
    val banded = DedupQueries.hyperplaneBanded(spark, sfDir)
      .select(col("band").cast("long"), col("band_key").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bucketSizes = banded.groupBy(identity).toSeq
      .map { case ((b, _), g) => (b, g.length.toLong) }
    val expected = bucketSizes.groupBy(identity).toSeq
      .map { case ((b, s), g) => (b, s, g.size.toLong, g.size * s * (s - 1) / 2) }
      .sortBy(t => (t._1, t._2))
    val got = DedupQueries.x15LshBucketProfile(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    // the profile's pair total IS the band join's candidate row count
    val joinRows = bucketSizes.map { case (_, n) => n * (n - 1) / 2 }.sum
    assert(got.map(_._4).sum == joinRows)
  }

  test("v13 range search equals a brute-force threshold scan") {
    val vecs = Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    // mirror dot_f: double promotion per element, left-to-right accumulate
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i).toDouble * b(i).toDouble; i += 1 }
      acc
    }
    val qs = vecs.filter(_._1 < 10)
    val expected = (for {
      q <- qs; v <- vecs
      if v._3 == q._3 && v._1 != q._1
      s = dot(v._2, q._2) if s >= 0.15
    } yield (q._1, v._1, math.rint(s * 1e6) / 1e6)).sortBy(p => (p._1, p._2))
    val got = SimilarityQueries.v13RangeSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "threshold must bite but not empty the result")
    // variable cardinality: not every query returns the same neighbor count
    val perQ = got.groupBy(_._1).map(_._2.length).toSet
    assert(perQ.size > 1)
  }
}
