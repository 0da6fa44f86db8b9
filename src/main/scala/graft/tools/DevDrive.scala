package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch driver for interactive probing (see .claude/skills/verify):
  * drives one engine round-trip and one driver query end-to-end. */
object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // engine round-trip on a real file with repeated content
    val dir = java.nio.file.Files.createTempDirectory("drive-engine").toString
    val e = new graft.engine.DedupeEngine(spark, dir,
      graft.core.DedupeSettings(256, 2048, 8, 1))
    val sample = java.nio.file.Paths.get("/root/reference/src/Test/SampleFiles/small.txt")
    val data = java.nio.file.Files.readAllBytes(sample)
    e.write("small.txt", data)
    val back = e.get("small.txt").get
    println(s"[drive] round-trip ok=${java.util.Arrays.equals(back, data)} " +
      s"stats=${e.indexStats().toTabularString.linesIterator.next()}")

    // one driver query
    val df = graft.SparkEntry.queries("q5_region_revenue")(spark, "/root/testdata/sf0.001")
    println(s"[drive] q5 rows=${df.count()}")
    spark.stop()
  }
}
