package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev probe: does Append-mode streaming agg DROP late rows vs the
  * watermark, and at which boundary (< vs <=)? Two controlled batches. */
object WmProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val agged = mem.toDF().toDF("id", "ts")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
    val q = agged.writeStream.outputMode("append")
      .format("memory").queryName("wmprobe").start()
    // batch 0: advance wm to 05:00:00.123 - 30min = 04:30:00.123
    mem.addData((1L, ts("2024-01-01 05:00:00.123")))
    q.processAllAvailable()
    // batch 1: late candidates —
    //  id 2: window [03:00,04:00) end 04:00 < wm      -> late
    //  id 3: window [04:00,05:00) end 05:00 > wm      -> on time
    //  id 4: window [05:00,06:00)                     -> current
    mem.addData((2L, ts("2024-01-01 03:10:00")),
                (3L, ts("2024-01-01 04:10:00")),
                (4L, ts("2024-01-01 05:10:00")))
    q.processAllAvailable()
    // flush: advance wm far, twice
    mem.addData((5L, ts("2024-01-02 12:00:00")))
    q.processAllAvailable()
    mem.addData((6L, ts("2024-01-02 13:00:00")))
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}" +
        s" dropped=${so.map(_.numRowsDroppedByWatermark)} late=${so.map(_.numRowsUpdated)}")
    }
    q.stop()
    spark.table("wmprobe").orderBy("w").show(20, false)
    spark.stop()
  }
}
