package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev probe: same late-drop scenario as WmProbe, but through the FILE
  * source (all files staged upfront, maxFilesPerTrigger=1), with
  * no-data micro-batches toggled by args(0). */
object WmProbe2 {
  def main(a: Array[String]): Unit = {
    val noData = if (a.nonEmpty) a(0) else "true"
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val d = java.nio.file.Files.createTempDirectory("wmprobe2")
    val staging = d.resolve("in"); java.nio.file.Files.createDirectories(staging)
    val batches = Seq(
      "0_main" -> Seq((1L, ts("2024-01-01 05:00:00.123"))),
      "1_late" -> Seq((2L, ts("2024-01-01 03:10:00")),
                      (3L, ts("2024-01-01 04:10:00")),
                      (4L, ts("2024-01-01 05:10:00"))),
      "2_flush" -> Seq((5L, ts("2024-01-02 12:00:00"))),
      "3_flush" -> Seq((6L, ts("2024-01-02 13:00:00"))))
    val staged = batches.zipWithIndex.map { case ((name, rows), i) =>
      val tmp = d.resolve(s"w_$name")
      rows.toDF("id", "ts").coalesce(1).write.parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).filter(p =>
        p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      (part, staging.resolve(s"$name.parquet"), i)
    }
    def land(e: (java.nio.file.Path, java.nio.file.Path, Int)): Unit = {
      java.nio.file.Files.copy(e._1, e._2)
      java.nio.file.Files.setLastModifiedTime(e._2,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + e._3 * 60000L))
    }
    land(staged.head) // only the main file exists at start
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ts", TimestampType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(staging.toString)
    val agged = src.withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("string").as("w"), col("n"))
    val q = agged.writeStream.outputMode("append")
      .format("memory").queryName("wmprobe2").start()
    q.processAllAvailable()
    staged.tail.foreach { e => land(e); q.processAllAvailable() }
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows} wm=${p.eventTime.get("watermark")}" +
        s" dropped=${so.map(_.numRowsDroppedByWatermark)}")
    }
    q.stop()
    spark.table("wmprobe2").orderBy("w").show(20, false)
    graft.core.FsUtil.deleteRecursively(d)
    spark.stop()
  }
}
