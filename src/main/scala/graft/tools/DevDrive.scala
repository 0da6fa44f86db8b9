package graft.tools

import graft.core.DedupeSettings
import graft.engine.DedupeEngine
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Scratch end-to-end drive (verify recipe): ingest a real directory with
  * odd filenames through the CLI-visible surface, reconstruct, byte-diff. */
object DevDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-devdrive")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val src = Files.createTempDirectory("drive-src")
      val ref = Files.readAllBytes(
        java.nio.file.Paths.get("/root/reference/src/Test/SampleFiles/small.txt"))
      Files.write(src.resolve("a b.txt"), ref)
      Files.write(src.resolve("p%25q.txt"), ref)
      Files.createDirectories(src.resolve("sub dir"))
      Files.write(src.resolve("sub dir/100%done.txt"), ref)
      val idx = Files.createTempDirectory("drive-idx").toString + "/idx"
      val e = DedupeEngine.create(spark, idx, DedupeSettings(256, 2048, 8, 1))
      e.ingestDirectory(src.toString)
      val st = e.indexStats()
      println(s"[drive] objects=${st.objectCount} chunks=${st.chunkCount} " +
        s"logical=${st.logicalBytes} physical=${st.physicalBytes}")
      for (k <- Seq("a b.txt", "p%25q.txt", "sub dir/100%done.txt")) {
        val got = e.get(k)
        println(s"[probe] key='$k' found=${got.isDefined} " +
          s"byteEqual=${got.exists(java.util.Arrays.equals(_, ref))}")
      }
      println(s"[probe] decodedGhost=${e.get("p%q.txt").isDefined} (must be false)")
      // 3 identical files: physical must be ~1/3 of logical (dedupe across objects)
      println(s"[probe] dedupeRatioX=${st.ratioX}")
      // drive the delete/GC path over the new CAS-committed, stats-targeted tables
      val gcd = e.delete("a b.txt")
      println(s"[probe] deleteSharedGc=${gcd.size} (0: chunks still shared)")
      val gcd2 = e.delete("p%25q.txt")
      val gcd3 = e.delete("sub dir/100%done.txt")
      println(s"[probe] lastSharerGc=${gcd3.size} (>0: orphans collected)")
      val st2 = e.indexStats()
      println(s"[probe] afterDeletes objects=${st2.objectCount} chunks=${st2.chunkCount} " +
        s"physical=${st2.physicalBytes} (all zero expected); gcd2=${gcd2.size}")
    } finally spark.stop()
  }
}
