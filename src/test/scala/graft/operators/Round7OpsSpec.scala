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
