package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

class EventStreamOpsSpec extends SparkSpec {

  private val eventsPath = s"$sfDir/events.parquet"

  test("hourly windowed agg over the stream equals the batch answer") {
    val streamed = EventStreamOps.runToMemory(spark, eventsPath, "hourly_t",
      EventStreamOps.hourlyByType, OutputMode.Complete())
    val batch = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    assert(streamed.count() == batch.count())
    val sTot = streamed.agg(sum("n")).head().getLong(0)
    val bTot = batch.agg(sum("n")).head().getLong(0)
    assert(sTot == bTot)
  }

  test("Append production path with tail flush equals Complete replay and batch") {
    val appended = EventStreamOps.runToMemoryAppend(spark, eventsPath, "hourly_ap",
      EventStreamOps.hourlyByType)
    val batch = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
    assert(appended.count() == batch.count(),
      "Append + watermark flush must finalize every window, including the tail")
    val aTot = appended.agg(sum("n")).head().getLong(0)
    val bTot = batch.agg(sum("n")).head().getLong(0)
    assert(aTot == bTot, "no event may be double-counted by the flush")
  }

  test("sliding windows produce more windows than tumbling") {
    val slid = EventStreamOps.runToMemory(spark, eventsPath, "slide_t",
      EventStreamOps.slidingValue, OutputMode.Complete())
    // independent tumbling baseline (batch) so this test runs in isolation
    val tumb = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type")).count()
    assert(slid.count() > tumb.count())
  }

  test("streaming dedupe drops replayed events") {
    // stage the events file TWICE into one source dir — a full replay
    val src = java.nio.file.Files.createTempDirectory("dup_events")
    val p = java.nio.file.Paths.get(eventsPath)
    java.nio.file.Files.copy(p, src.resolve("a.parquet"))
    java.nio.file.Files.copy(p, src.resolve("b.parquet"))
    val deduped = EventStreamOps.runToMemory(spark, src.toString, "dedup_t",
      EventStreamOps.dedupedEvents)
    val distinctIds = graft.operators.Tables.t(spark, sfDir, "events")
      .select("event_id").distinct().count()
    assert(deduped.count() == distinctIds,
      "replayed copy must be fully deduplicated within the watermark")
  }

  test("watermarked transforms survive a many-file source (no cross-file watermark drops)") {
    // 6 part files, each spanning the FULL time range (typical Spark output):
    // if any file lands in a later micro-batch than another, the advanced
    // watermark silently drops its events from a watermarked Append
    // transform — the replay path must ingest the whole snapshot in one batch
    val src = java.nio.file.Files.createTempDirectory("manyfile_events").toString + "/parts"
    graft.operators.Tables.t(spark, sfDir, "events")
      .withColumn("ts", expr("unix_micros(ts) * 1000")) // back to raw ns longs
      .repartition(6)
      .write.parquet(src)
    val deduped = EventStreamOps.runToMemory(spark, src, "manyfile_t",
      EventStreamOps.dedupedEvents)
    val total = graft.operators.Tables.t(spark, sfDir, "events").count()
    assert(deduped.count() == total,
      s"all $total events must survive a 6-file watermarked replay (got ${deduped.count()})")
  }

  test("hourlyByType runs over a live rate source (transforms not coupled to file replay)") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    // deterministic synthetic stream: fixed rows per batch, event time
    // advancing 10 minutes per batch from epoch 0
    val rate = s2.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", "100")
      .option("startTimestamp", "0")
      .option("advanceMillisPerBatch", "600000")
      .load()
    val events = rate.select(
      col("value").as("event_id"),
      col("timestamp").as("ts"),
      (col("value") % 7).as("user_id"),
      concat(lit("t"), (col("value") % 3).cast("string")).as("event_type"),
      (col("value") % 100).cast("double").as("value"),
      lit("{}").as("props"))
    val q = EventStreamOps.hourlyByType(events)
      .writeStream.outputMode(OutputMode.Complete()).format("memory")
      .queryName("rate_hourly").start()
    try {
      val deadline = System.currentTimeMillis() + 90000
      while (s2.table("rate_hourly").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(250)
      assert(!s2.table("rate_hourly").isEmpty,
        "hourly agg must emit from a live rate source")
      val n = s2.table("rate_hourly").agg(sum("n")).head().getLong(0)
      assert(n > 0 && n % 100 == 0, s"complete batches of 100 expected, saw $n")
    } finally q.stop()
  }

  test("stream-static join equals the batch join (stateless, no flush needed)") {
    val customers = graft.operators.Tables.t(spark, sfDir, "customer")
    val streamed = EventStreamOps.runToMemoryAppend(spark, eventsPath, "ss_join",
      e => EventStreamOps.purchaseEnrich(e,
        graft.operators.Tables.t(e.sparkSession, sfDir, "customer")),
      flushTail = false)
      .select("event_id", "user_id", "value", "c_name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    val batch = EventStreamOps.purchaseEnrich(
      graft.operators.Tables.t(spark, sfDir, "events"), customers)
      .select("event_id", "user_id", "value", "c_name").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = EventStreamOps.runToMemory(spark, eventsPath, "ssj_t",
      EventStreamOps.clickViewJoin)
    val e = graft.operators.Tables.t(spark, sfDir, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val batch = c.join(v,
      col("c_user") === col("v_user") &&
        col("view_ts") <= col("click_ts") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 30 MINUTES"))
    assert(streamed.count() == batch.count(),
      "stream-stream join must emit exactly the batch join's matches")
    assert(streamed.count() > 0)
  }

  test("left-outer stream-stream join emits unmatched views with NULL click") {
    // Append path with tail flush: outer-side NULL rows only emit once the
    // watermark passes a view's match window, so the drained-source flush is
    // what releases the tail (without it the unmatched tail is silently held)
    val streamed = EventStreamOps.runToMemoryAppend(spark, eventsPath, "vcoj_t",
      EventStreamOps.viewClickOuterJoin)
      .filter(col("view_id") >= 0) // drop self-matched heartbeat rows (negative ids)
    val e = graft.operators.Tables.t(spark, sfDir, "events")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val batch = v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    assert(streamed.count() == batch.count(),
      "outer join must emit matched + watermark-released unmatched rows, same as batch")
    val streamedNulls = streamed.filter(col("click_id").isNull).count()
    val batchNulls = batch.filter(col("click_id").isNull).count()
    assert(streamedNulls == batchNulls, "unmatched views must emit with NULL click")
    assert(streamedNulls > 0, "corpus must exercise the outer path")
  }

  test("Append path over a MULTI-FILE snapshot loses no events") {
    // Every part file of a repartitioned snapshot spans the full time range
    // (round-robin split) — exactly the shape where a small per-trigger file
    // cap would let the first micro-batch advance the watermark past events
    // still waiting in later files, silently dropping them. The finite
    // replay must ingest the snapshot in one batch instead.
    val src = java.nio.file.Files.createTempDirectory("multi_events")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(eventsPath)
      .repartition(6)
      .write.mode("overwrite").parquet(src.toString)
    val streamed = EventStreamOps.runToMemoryAppend(spark, src.toString, "multi_ap",
      EventStreamOps.hourlyByType)
    val batch = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() == batch.count(),
      "all windows must finalize even when the snapshot arrives as many files")
    val sTot = streamed.agg(sum("n")).head().getLong(0)
    val bTot = batch.agg(sum("n")).head().getLong(0)
    assert(sTot == bTot, "no event from any part file may be dropped")
  }

  test("empty events source fails loudly at staging, not with an NPE") {
    val empty = java.nio.file.Files.createTempDirectory("empty_events")
    val e = intercept[IllegalArgumentException] {
      EventStreamOps.runToMemoryAppend(spark, empty.toString, "empty_ap",
        EventStreamOps.hourlyByType)
    }
    assert(e.getMessage.contains("nothing to replay"))
  }

  test("streaming session_window equals the batch session_window") {
    val streamed = EventStreamOps.runToMemoryAppend(spark, eventsPath, "sess_w",
      EventStreamOps.sessionizeByUser)
      .filter(col("user_id") >= 0) // drop the flush row's own session
    val batch = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("session_value"))
    assert(streamed.count() == batch.count(),
      "every session, including the tail ones, must finalize and emit")
    val sTot = streamed.agg(sum("n_events")).head().getLong(0)
    val bTot = batch.agg(sum("n_events")).head().getLong(0)
    assert(sTot == bTot, "no event may be lost or double-counted")
  }

  test("custom-state sessionizer equals the native session_window bit-for-bit") {
    val custom = EventStreamOps.runToMemoryAppend(spark, eventsPath, "csess_w",
      EventStreamOps.customSessions)
    val native = EventStreamOps.runToMemoryAppend(spark, eventsPath, "nsess_w",
      EventStreamOps.sessionizeByUser)
      .filter(col("user_id") >= 0)
      .select(col("user_id"), unix_micros(col("session_start")).as("session_start_us"),
        col("n_events"), col("session_value"))
    assert(custom.count() == native.count(),
      "session count must match the native operator")
    // bit-for-bit: decimal-exact value sums, identical session boundaries
    assert(custom.exceptAll(native).isEmpty && native.exceptAll(custom).isEmpty,
      "flatMapGroupsWithState sessions must be row-identical to session_window")
  }

  test("streaming SCD2 emits exactly the batch history's closed runs") {
    val streamed = EventStreamOps.runToMemoryAppend(spark, eventsPath, "scd2_w",
      EventStreamOps.streamScd2)
    val batch = graft.operators.AnalyticsQueries.r6Scd2History(spark, sfDir)
      .filter(col("valid_to").isNotNull)
      .select("user_id", "state", "valid_from", "valid_to", "version")
    assert(streamed.count() == batch.count(),
      "closed-run count must match the batch SCD2")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "incremental dimension rows must equal the nightly-rebuild rows")
    // the open runs (one per user) stay in state, not in output
    val users = graft.operators.Tables.t(spark, sfDir, "events")
      .select("user_id").distinct().count()
    val batchAll = graft.operators.AnalyticsQueries.r6Scd2History(spark, sfDir).count()
    assert(batchAll - streamed.count() == users,
      "exactly one open (unemittable) run per user")
  }

  test("stateful user sessions accumulate counts per user") {
    val sessions = EventStreamOps.runToMemory(spark, eventsPath, "sess_t",
      df => EventStreamOps.userSessions(spark, df).toDF(),
      OutputMode.Update())
    // last update per user carries that user's running event count
    val perUser = sessions.groupBy("userId").agg(max("nEvents").as("n"))
    val batchPerUser = graft.operators.Tables.t(spark, sfDir, "events")
      .groupBy(col("user_id").as("userId")).agg(count(lit(1)).as("n"))
    val joined = perUser.join(batchPerUser, "userId")
      .filter(perUser("n") =!= batchPerUser("n"))
    assert(perUser.count() == batchPerUser.count())
    assert(joined.isEmpty, "streamed per-user counts must match batch")
  }
}
