package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan + scale evidence for the round-7 batch-E/F additions: t8 (CUSUM
  * walk), r6 (SCD2), y18 (BM25), m6 (media dedupe), w10 (assoc rules),
  * v14 (quantizer drift). Dumps formatted plans at sf0.1, then times each
  * at sf0.1 vs the ScaleUp-built sf1 corpus (warm shapes).
  * Usage: runMain graft.tools.R7cProbe [scaledDir] */
object R7cProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = "/root/testdata/sf0.1"
    val names = Seq("t8_cusum_drift", "r6_scd2_history", "y18_bm25",
      "m6_media_dedup", "w10_assoc_rules", "v14_quantizer_drift",
      "y19_bigram_typicality", "j6_scd2_lookup", "n1_pagerank",
      "t9_weekly_ohlc", "n2_hits", "n3_khop_reach")
    for (n <- Seq("r6_scd2_history", "y18_bm25", "w10_assoc_rules",
        "j6_scd2_lookup", "y19_bigram_typicality", "n1_pagerank")) {
      println(s"=== $n formatted plan (sf0.1) ===")
      graft.SparkEntry.queries(n)(spark, sf01).explain("formatted")
    }
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[r7c] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (d <- Seq(sf01, dir); n <- names)
      timed(s"$n ${if (d == sf01) "sf0.1" else "sf1"}")(
        graft.SparkEntry.queries(n)(spark, d).count())
    spark.stop()
  }
}
