package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.core.DedupeSettings
import graft.engine.DedupeEngine

/** Verify-recipe drive: engine round-trip on a real file. */
object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val data = Files.readAllBytes(Paths.get("/root/reference/src/Test/SampleFiles/small.txt"))
    val dir = Files.createTempDirectory("drive_idx").toString
    val eng = DedupeEngine.create(spark, dir, DedupeSettings(256, 2048, 8, 1))
    eng.write("small.txt", data)
    val back = eng.get("small.txt").getOrElse(sys.error("get returned None"))
    println(s"[drive] wrote ${data.length} B, read ${back.length} B, " +
      s"identical=${java.util.Arrays.equals(data, back)}")
    val stats = eng.indexStats()
    println(s"[drive] stats: $stats")
    val chunkKeys = eng.objmap.select("chunkKey").collect().map(_.getString(0))
    println(s"[drive] chunks=${chunkKeys.length} distinct=${chunkKeys.distinct.length} " +
      s"(duplicate paragraphs => expect distinct < chunks OR equal if boundaries differ)")
    eng.delete("small.txt")
    println(s"[drive] after delete exists=${eng.exists("small.txt")}")
    spark.stop()
  }
}
