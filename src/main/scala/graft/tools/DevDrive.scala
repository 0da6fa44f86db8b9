package graft.tools

import graft.core.DedupeSettings
import graft.engine.DedupeEngine
import org.apache.spark.sql.SparkSession
import java.nio.file.Files
import scala.jdk.CollectionConverters._

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
      // drive the bucketed-index layout through the CLI surface: create
      // --bucketed persists the layout, a hash-keyed write commits bucketed
      // segments, reopen + delete round-trips
      val bidx = Files.createTempDirectory("drive-bidx").toString + "/idx"
      graft.apps.DedupeCli.run(spark, bidx, "create", Array("256", "2048", "8", "1", "--bucketed"))
      val cfg = new String(Files.readAllBytes(
        java.nio.file.Paths.get(bidx, "config.properties")), "UTF-8")
      println(s"[probe] bucketedPersisted=${cfg.contains("bucketed_index=true")}")
      val hk = java.security.MessageDigest.getInstance("SHA-256")
        .digest(ref).map("%02x".format(_)).mkString
      val tmpFile = Files.createTempFile("drive-b", ".bin")
      Files.write(tmpFile, ref)
      graft.apps.DedupeCli.run(spark, bidx, "write", Array(hk, tmpFile.toString))
      val be = DedupeEngine.open(spark, bidx)
      val bGot = be.get(hk)
      println(s"[probe] bucketedRoundTrip=${bGot.exists(java.util.Arrays.equals(_, ref))}")
      def listClosed(p: java.nio.file.Path): List[java.nio.file.Path] = {
        val s = Files.list(p)
        try s.iterator().asScala.toList finally s.close()
      }
      val sawBucket = listClosed(java.nio.file.Paths.get(bidx, "objects"))
        .exists(p => Files.isDirectory(p) &&
          listClosed(p).exists(_.getFileName.toString.startsWith("__bucket=")))
      println(s"[probe] bucketedLayout=$sawBucket (objects segment partitioned by key char)")
      be.delete(hk)
      println(s"[probe] bucketedDelete ok objects=${be.indexStats().objectCount}")
      // maintenance surface: sorted major compaction through the CLI
      graft.apps.DedupeCli.run(spark, bidx, "write", Array("ffee0011", tmpFile.toString))
      graft.apps.DedupeCli.run(spark, bidx, "compact", Array())
      val cGot = DedupeEngine.open(spark, bidx).get("ffee0011")
      println(s"[probe] compactRoundTrip=${cGot.exists(java.util.Arrays.equals(_, ref))}")
      graft.apps.DedupeCli.run(spark, bidx, "vacuum", Array())
      val vGot = DedupeEngine.open(spark, bidx).get("ffee0011")
      println(s"[probe] vacuumRoundTrip=${vGot.exists(java.util.Arrays.equals(_, ref))}")
    } finally spark.stop()
  }
}
