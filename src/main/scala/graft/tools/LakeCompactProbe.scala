package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale witness for [[graft.streaming.LakeStreamWriter.compactShards]]:
  * build the streamed Hilbert lake at SPARK_GRAFT_SF_DIR (the st20 path —
  * 4 micro-batch appends, several files per shard), record file/dir
  * counts and the zone-skip audit rows, compact, re-record. Proves the
  * fold at real shard counts (~342 dirs at ≥ sf0.1) and prices the one
  * range-clustered job; output cited in COVERAGE.md. */
object LakeCompactProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-lake-compact-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import scala.jdk.CollectionConverters._
    val root = graft.streaming.LakeStreamWriter.streamedLakeRoot(spark, dir)
    def census(): (Int, Int) = {
      val rootP = java.nio.file.Paths.get(root)
      def walk(p: java.nio.file.Path): Seq[java.nio.file.Path] =
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.list(p)
          try {
            val b = Seq.newBuilder[java.nio.file.Path]
            s.iterator().forEachRemaining(c => b ++= walk(c))
            b.result()
          } finally s.close()
        } else Seq(p)
      val files = walk(rootP).map(_.getFileName.toString)
        .count(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      val dirs = {
        val s = java.nio.file.Files.list(rootP)
        try s.iterator().asScala.count(_.getFileName.toString.startsWith("hshard="))
        finally s.close()
      }
      (files, dirs)
    }
    def audit() = graft.operators.LayoutOps.hilbertTreeAudit(spark, root)
      .collect().map(_.toSeq).toSeq
    val (f0, d0) = census()
    val a0 = audit()
    println(s"[lake] before: $f0 files over $d0 shard dirs")
    val t0 = System.nanoTime()
    graft.streaming.LakeStreamWriter.compactShards(spark, root)
    println(f"[lake] compactShards: ${(System.nanoTime() - t0) / 1e9}%.2f s (one range-clustered job + $d0 dir swaps)")
    val (f1, d1) = census()
    val same = audit() == a0
    println(s"[lake] after: $f1 files over $d1 shard dirs; audit unchanged=$same")
    assert(same && d1 == d0 && f1 == d1 && f1 < f0)
    spark.stop()
  }
}
