package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch check: do SimHash band candidates recall EVERY exact-Jaccard
  * pair (x3's set) on the test corpora? Decides whether x5 can take the
  * x4-style verified-pair oracle bridge. */
object SimhashRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[16]").appName("graft-simhash-recall")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
        val x3 = graft.operators.DedupQueries.x3NgramJaccardPairs(spark, dir)
          .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // x5's candidate stage: pairs colliding in any 16-bit simhash band
        val x5pairs = graft.operators.DedupQueries.x5SimhashPairs(spark, dir)
          .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        // x5 emits hamming<=12-filtered pairs; candidates are a superset.
        // For the bridge we need: every x3 pair appears among CANDIDATES
        // (band collisions). x5's output is candidates ∩ hamming<=12, so if
        // x3 ⊆ x5-output the bridge is safe a fortiori.
        val missing = x3.diff(x5pairs)
        println(s"[recall] $dir x3=${x3.size} x5out=${x5pairs.size} x3missingFromX5out=${missing.size} ${missing.take(5)}")
      }
    } finally spark.stop()
  }
}
