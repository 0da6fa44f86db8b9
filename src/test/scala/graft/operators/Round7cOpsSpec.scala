package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * Brute-force JVM oracles for the round-7 batch-E additions
 * (t8/r6/y18/m6) on the sf0.001 corpus — complementing the driver's
 * DuckDB hash gate with independent in-JVM recomputation.
 */
class Round7cOpsSpec extends SparkSpec {

  test("t8 CUSUM drift equals a brute-force integer recursion walk") {
    val dayUs = 86400L * 1000000L
    val rows = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1) / dayUs, r.getDouble(2)))
    // daily decimal(18,6) totals scaled to exact micro longs
    val daily = rows.groupBy(t => (t._1, t._2)).map { case ((ty, day), es) =>
      val x = es.map(e => BigDecimal(e._3).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _)
      (ty, day, (x * 1000000).toLongExact)
    }.toSeq
    val expected = daily.groupBy(_._1).flatMap { case (ty, ds) =>
      val sorted = ds.sortBy(_._2)
      val n = sorted.length.toLong
      val s = sorted.map(_._3).sum
      var t = 0L
      sorted.map { case (_, day, xl) =>
        val inj = if (ty == "purchase" && day >= 19743L) 2L else 0L
        t = math.max(0L, t + 4L * n * xl - 5L * s + inj * s)
        (ty, day) -> (xl.toDouble / 1e6, t.toDouble / (n.toDouble * 4000000.0), t > 4L * s)
      }
    }
    val got = AnalyticsQueries.t8CusumDrift(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got == expected)
    assert(got.exists { case ((ty, day), v) => ty == "purchase" && day >= 19747L && v._3 },
      "the injected +mu/2 purchase shift must flag within the tail")
    assert(got.exists { case ((ty, day), v) => ty == "purchase" && day < 19743L && !v._3 },
      "pre-shift purchase days must not all flag")
  }

  test("r6 SCD2 history equals a brute-force per-user run scan") {
    val events = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = events.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      // collapse consecutive same-type events into runs
      val starts = sorted.zipWithIndex.filter { case (e, i) =>
        i == 0 || sorted(i - 1)._4 != e._4
      }.map(_._1)
      starts.zipWithIndex.map { case (e, v) =>
        val validTo = if (v + 1 < starts.length) Some(starts(v + 1)._3) else None
        (uid, v + 1L) -> (e._4, e._3, validTo, validTo.isEmpty)
      }.toSeq
    }
    val got = AnalyticsQueries.r6Scd2History(spark, sfDir).collect()
      .map { r =>
        val vt = if (r.isNullAt(3)) None else Some(r.getLong(3))
        (r.getLong(0), r.getLong(4)) -> (r.getString(1), r.getLong(2), vt, r.getBoolean(5))
      }.toMap
    assert(got == expected)
    // every user has exactly one open-ended current row
    val currents = got.toSeq.groupBy(_._1._1).map { case (_, rs) => rs.count(_._2._4) }
    assert(currents.forall(_ == 1), "exactly one is_current row per user")
    assert(got.values.exists(!_._4), "closed historical rows must exist")
  }

  test("y18 BM25 equals a brute-force double-for-double scoring") {
    val terms = Seq("spark", "join", "filter")
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val toks = docs.map { case (id, tx) => (id, tx.split(" ", -1)) }
    val dls = toks.map { case (id, ts) => (id, ts.length.toLong) }.toMap
    val n = docs.length.toLong
    val sdl = dls.values.sum
    val avgdl = sdl.toDouble / n
    val tf = toks.map { case (id, ts) =>
      (id, terms.map(tm => tm -> ts.count(_ == tm).toLong).toMap)
    }.toMap
    val df = terms.map(tm => tm -> tf.values.count(_(tm) > 0).toLong).toMap
    def score(id: Long): Double =
      terms.map { tm =>
        val t = tf(id)(tm).toDouble
        val idf = (n.toDouble - df(tm) + 0.5) / (df(tm).toDouble + 0.5)
        idf * (t * (1.2 + 1.0)) /
          (t + 1.2 * (1.0 - 0.75 + 0.75 * (dls(id).toDouble / avgdl)))
      }.reduce(_ + _)
    val expected = docs.map(_._1).sortBy(id => (-score(id), id)).take(50)
      .map(id => (id, dls(id),
        // valueOf (shortest-repr) mirrors Spark's Round, not new BigDecimal
        BigDecimal.valueOf(score(id)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    val got = TextQueries.y18Bm25(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == expected.toSeq)
    assert(got.head._3 > got.last._3, "scores must actually discriminate")
  }

  test("w10 association rules equal a brute-force basket walk") {
    val edges = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nBaskets = edges.map(_._1).distinct.length.toLong
    val cnt = edges.groupBy(_._2).map { case (p, es) => p -> es.length.toLong }
    val pairCounts = edges.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val parts = es.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val top = pairCounts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val expected = top.map { case ((a, b), n) =>
      (a, b, n, n.toDouble / nBaskets, n.toDouble / cnt(a), n.toDouble / cnt(b),
        (n.toDouble * nBaskets) / (cnt(a).toDouble * cnt(b)))
    }
    val got = AnalyticsQueries.w10AssocRules(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(got.toSeq == expected)
    assert(expected.forall(r => r._7 > 0 && r._4 <= r._5 && r._4 <= r._6),
      "support can never exceed either confidence")
  }

  test("j6 SCD2 lookup equals a brute-force as-of scan; every purchase counted once") {
    val events = Tables.t(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val touchesByUser = events.filter(e => e._4 == "click" || e._4 == "view")
      .groupBy(_._1).map { case (u, es) => u -> es.sortBy(e => (e._3, e._2)) }
    val purchases = events.filter(_._4 == "purchase")
    val credited = purchases.map { p =>
      // as-of mode = type of the latest touch at-or-before the purchase
      val mode = touchesByUser.get(p._1)
        .flatMap(ts => ts.takeWhile(t => t._3 <= p._3).lastOption.map(_._4))
        .getOrElse("none")
      (mode, p._5)
    }
    val expected = credited.groupBy(_._1).map { case (m, vs) =>
      m -> ((vs.length.toLong,
        vs.map(x => BigDecimal(x._2).setScale(6, BigDecimal.RoundingMode.HALF_UP))
          .foldLeft(BigDecimal(0))(_ + _).toDouble))
    }
    val got = JoinQueries.j6Scd2Lookup(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got == expected)
    assert(got.values.map(_._1).sum == purchases.length,
      "half-open runs tile the timeline: each purchase credited exactly once")
    assert(got.contains("click") && got.contains("view"),
      "both browsing modes must attract purchases")
  }

  test("tokenOcc is the exact token frequency on adversarial adjacent-repeat text") {
    import spark.implicits._
    // vocab chosen so substring traps ("a" in "ab"/"aa") and adjacent
    // repeats ("a a a") both occur — the two failure modes of naive
    // replace counting (the latter is the documented wordCount limit)
    val vocab = Seq("a", "ab", "b", "spark", "aa")
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val out = rows.toDF("id", "text").select(col("id"),
      TextQueries.tokenOcc(col("text"), "a").as("occ"),
      TextQueries.wordCount(col("text"), "a").as("wc")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { case (id, tx) =>
      val exact = tx.split(" ", -1).count(_ == "a").toLong
      assert(out(id)._1 == exact, s"tokenOcc wrong for '$tx'")
      assert(out(id)._2 <= exact, s"wordCount must never overcount ('$tx')")
    }
    assert(rows.exists { case (id, tx) =>
      out(id)._2 < tx.split(" ", -1).count(_ == "a") },
      "the generator must hit the adjacent-repeat case wordCount undercounts")
  }

  test("y19 bigram typicality equals a brute-force bigram-frequency walk") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val bgs = docs.flatMap { case (id, lang, tx) =>
      tx.split(" ", -1).sliding(2).collect {
        case Array(a, b) => (id, lang, s"$a $b")
      }
    }
    val cf = bgs.groupBy(_._3).map { case (k, v) => k -> v.length.toLong }
    val perDoc = bgs.groupBy(d => (d._1, d._2)).map { case ((id, lang), es) =>
      (id, lang, es.length.toLong, es.map(e => cf(e._3)).sum)
    }.toSeq
    val gs = perDoc.map(_._4).sum
    val gn = perDoc.map(_._3).sum
    val expected = perDoc.groupBy(_._2).map { case (lang, ds) =>
      lang -> (ds.size.toLong,
        ds.count(d => 100L * d._4 * gn < 97L * gs * d._3).toLong,
        BigDecimal.valueOf(ds.map(_._4).sum.toDouble / ds.map(_._3).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = TextQueries.y19BigramTypicality(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "the order-2 filter must flag someone")
  }

  test("v14 quantizer drift audit is complete and the drift actually bites") {
    val rows = SimilarityQueries.v14QuantizerDrift(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val corpus = Tables.t(spark, sfDir, "embeddings").count()
    // every corpus vector is accounted for under the old quantizer, and
    // the shared cells are exactly the old quantizer's init ids
    // (vec_id < 10 minus the %7==0 holdout: 7 and 0 are absent)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3, 4, 5, 6, 8, 9))
    assert(rows.map(_._2).sum == corpus)
    assert(rows.forall(r => r._3 >= 0 && r._3 <= r._2))
    // retraining on the full corpus must actually move members somewhere —
    // the audit's reason to exist
    assert(rows.exists(_._3 > 0), "some cell must show membership churn")
  }

  test("t9 weekly OHLC equals a brute-force resample walk") {
    val wkUs = 7L * 86400L * 1000000L
    val events = Tables.t(spark, sfDir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val expected = events.groupBy(e => (e._1, e._2 / wkUs)).map { case (k, es) =>
      val open = es.minBy(e => (e._2, e._3))._4
      val close = es.maxBy(e => (e._2, e._3))._4
      val mass = es.map(e => BigDecimal(e._4).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .foldLeft(BigDecimal(0))(_ + _).toDouble
      k -> ((open, es.map(_._4).max, es.map(_._4).min, close, es.length.toLong, mass))
    }
    val got = AnalyticsQueries.t9WeeklyOhlc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6), r.getDouble(7)))).toMap
    assert(got == expected)
    assert(got.values.exists(v => v._1 != v._4),
      "some week must open and close on different observations")
  }

  test("n1 PageRank equals a brute-force two-iteration power walk") {
    val pairs = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edges = pairs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val ps = es.map(_._2).toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.groupBy(identity).map { case ((s, d), v) => (s, d, v.size.toLong) }.toSeq
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val withP = edges.map { case (s, d, w) => (s, d, w.toDouble / outW(s)) }
    val n = edges.map(_._1).distinct.size.toLong
    var r = edges.map(_._1).distinct.map(p => p -> (1.0 / n)).toMap
    for (_ <- 1 to 2) {
      val acc = scala.collection.mutable.Map.empty[Long, BigDecimal]
      withP.foreach { case (s, d, p) =>
        // valueOf (shortest repr) mirrors Spark's double->decimal cast
        val q = BigDecimal.valueOf(r(s) * p * 0.85)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
        acc(d) = acc.getOrElse(d, BigDecimal(0)) + q
      }
      r = acc.map { case (d, c) => d -> (0.15 / n + c.toDouble) }.toMap
    }
    val expected = r.toSeq.sortBy { case (p, v) => (-v, p) }.take(20)
      .map { case (p, v) =>
        (p, BigDecimal.valueOf(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = GraphOps.n1Pagerank(spark, sfDir).collect()
      .map(r2 => (r2.getLong(0), r2.getDouble(1)))
    assert(got.toSeq == expected)
    assert(expected.head._2 > 1.0 / n,
      "the top part must rank above the uniform prior")
  }

  test("n2 HITS equals a brute-force alternating walk") {
    val orders = Tables.t(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val edges = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (orders(r.getLong(0)), r.getLong(1))).distinct
    def q(d: Double) =
      BigDecimal.valueOf(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def l1(raw: Map[Long, BigDecimal]): Map[Long, Double] = {
      val m = raw.values.foldLeft(BigDecimal(0))(_ + _).toDouble
      raw.map { case (k, v) => k -> v.toDouble / m }
    }
    var auth = edges.map(_._2).distinct.map(_ -> 1.0).toMap
    var hub = Map.empty[Long, Double]
    for (_ <- 1 to 2) {
      hub = l1(edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => q(auth(e._2))).foldLeft(BigDecimal(0))(_ + _)
      })
      auth = l1(edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => q(hub(e._1))).foldLeft(BigDecimal(0))(_ + _)
      })
    }
    val expected = auth.toSeq.sortBy { case (p, s) => (-s, p) }.take(20)
      .map { case (p, s) =>
        (p, BigDecimal.valueOf(s).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = GraphOps.n2Hits(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == expected)
    assert(expected.head._2 > expected.last._2, "authorities must discriminate")
  }

  test("n3 k-hop reach equals a brute-force BFS") {
    val pairs = Tables.t(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.groupBy(_._1).values.flatMap { es =>
      val ps = es.map(_._2).distinct.toSeq
      for (a <- ps; b <- ps if a != b) yield (a, b)
    }.toSeq.distinct.groupBy(_._1).map { case (s, ds) => s -> ds.map(_._2).toSet }
    val seed = adj.keys.min
    var visited = Set(seed)
    var frontier = Set(seed)
    val expected = scala.collection.mutable.Buffer((0, 1L))
    for (h <- 1 to 3) {
      frontier = frontier.flatMap(p => adj.getOrElse(p, Set.empty)) -- visited
      expected += ((h, frontier.size.toLong))
      visited ++= frontier
    }
    val got = GraphOps.n3KhopReach(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(expected(1)._2 > 0 && expected(2)._2 > 0,
      "the seed must actually reach the graph at hops 1 and 2")
  }

  test("m6 media dedupe equals a brute-force sha256 grouping") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val metas = docs.map { case (id, tx) =>
      val payload = if (id % 11 == 0) s"dup payload ${id % 3}" else tx
      MultimodalOps.stubDecode(id, payload.getBytes("UTF-8"))
    }
    val expected = metas.groupBy(_.contentHash).map { case (_, ms) =>
      (ms.head.mediaType, ms.length.toLong, ms.head.byteLen)
    }.groupBy(_._1).map { case (ty, gs) =>
      ty -> (gs.size.toLong, gs.map(_._2).sum, gs.count(_._2 > 1).toLong,
        gs.map(_._2 - 1).sum, gs.map(g => (g._2 - 1) * g._3).sum)
    }
    val got = MultimodalOps.mm6MediaDedup(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == expected)
    assert(got.values.exists(_._4 > 0), "the corpus has exact dups to reclaim")
  }
}
