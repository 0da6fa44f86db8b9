package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** st15's contracts: (1) the watermark drop BOUNDARY is `window.end <=
  * watermark` with the watermark collected in floored milliseconds —
  * pinned with a crafted equality batch; (2) the drop METER counts
  * post-partial-agg rows (= distinct expired windows); (3) on the corpus
  * replay, drops are confined to the injected late slice and the
  * admitted remainder aggregates exactly. */
class LateDataAuditSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("drop boundary is window.end <= watermark (floored-ms), meter counts windows") {
    val session = spark.newSession()
    session.conf.set("spark.sql.shuffle.partitions", "2")
    import session.implicits._
    implicit val ctx = session.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    val agged = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
    val name = s"lda_boundary_${System.nanoTime()}"
    val q = agged.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      // advance wm to EXACTLY 04:30:00.000 (max 05:00:00.000 - 30 min —
      // on the ms grid, so flooring is identity and the boundary is exact)
      mem.addData((1L, ts("2024-01-01 05:00:00.0")))
      q.processAllAvailable()
      // three probes against wm = 04:30:00.000, one row per window —
      //   window [04:00, 04:30): end == wm  -> the boundary case
      //   window [03:30, 04:00): end <  wm  -> must drop
      //   window [04:30, 05:00): end >  wm  -> must admit
      // (meter row-vs-window semantics are pinned by the corpus test
      // below, where the single-partition late file makes them distinct)
      mem.addData((2L, ts("2024-01-01 04:10:00")),
        (3L, ts("2024-01-01 03:40:00")),
        (5L, ts("2024-01-01 04:40:00")))
      q.processAllAvailable()
      // flush far ahead so surviving windows emit
      mem.addData((6L, ts("2024-01-02 12:00:00")))
      q.processAllAvailable()
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      val out = session.table(name).as[(String, Long)].collect().toMap
      assert(!out.contains("2024-01-01 04:00:00"),
        "window ending exactly AT the watermark must be dropped (boundary is <=)")
      assert(!out.contains("2024-01-01 03:30:00"), "strictly late window must drop")
      assert(out.get("2024-01-01 04:30:00").contains(1L),
        "window ending after the watermark must admit its late row")
      assert(dropped == 2L, s"exactly the two late windows drop: got $dropped")
    } finally q.stop()
  }

  test("st15 corpus replay: drops confined to the injected slice, admitted rows aggregate") {
    import org.apache.spark.sql.Row
    val out = LateDataAudit.st15LateAudit(spark, sfDir).collect()
    val (droppedRow, buckets) = out.partition(_.getString(0) == "__dropped__")
    assert(droppedRow.length == 1)
    val dropped = droppedRow.head.getLong(1)
    // recompute both sides in batch SQL over the same normalized events
    val ev = graft.operators.Tables.normalizeEventTs(
      spark.read.parquet(s"$sfDir/events.parquet"))
    import spark.implicits._
    val mu = ev.agg(max(unix_micros(col("ts")))).as[Long].collect()(0)
    val wmu = (mu / 1000 - 1800000) * 1000
    val late = ev.filter(unix_micros(col("ts")) > mu - 21600000000L)
      .withColumn("ts", col("ts") - expr("INTERVAL 1 HOURS"))
      .withColumn("wend", unix_micros(date_trunc("hour", col("ts"))) + 3600000000L)
    val expectedDropped = late.filter(col("wend") <= wmu)
      .select(date_trunc("hour", col("ts"))).distinct().count()
    val admitted = late.filter(col("wend") > wmu)
    assert(dropped == expectedDropped, "meter equals distinct expired windows")
    assert(admitted.count() > 0 && expectedDropped > 0,
      "the slice must straddle the cutoff: both outcomes exercised")
    // admitted late rows are IN the buckets: total n = all events + admitted
    val totalN = buckets.map(_.getLong(1)).sum
    assert(totalN == ev.count() + admitted.count(),
      "per-hour counts = originals + admitted late rows, nothing else")
  }
}
