package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-batch watermark/drop trajectory of st15's replay. */
object St15Probe {
  def main(a: Array[String]): Unit = {
    val root = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    root.sparkContext.setLogLevel("WARN")
    val out = graft.streaming.LateDataAudit.st15LateAudit(root, "/root/testdata/sf0.001")
    out.show(5, false)
    graft.streaming.LateDataAudit.lastProgressDump.foreach(println)
    root.stop()
  }
}
