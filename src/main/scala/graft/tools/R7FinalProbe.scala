package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan + scale evidence for the final round-7 additions: v11 (SQ8),
  * t5 (EWMA), y17 (markup strip), j4 (interval anti-join), w7 (basket
  * pairs), r4 (pivot), m4 (frame sampling), p3 (CMS heavy hitters).
  * Dumps formatted plans at sf0.1, then times each at sf0.1 vs the
  * ScaleUp-built sf1 corpus (warm shapes).
  * Usage: runMain graft.tools.R7FinalProbe [scaledDir] */
object R7FinalProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = "/root/testdata/sf0.1"
    val names = Seq("v11_sq8_search", "t5_ewma_smooth", "y17_markup_strip",
      "j4_interval_anti", "w7_basket_pairs", "r4_pivot_matrix",
      "m4_frame_sample", "p3_cms_topk")
    for (n <- Seq("j4_interval_anti", "w7_basket_pairs", "p3_cms_topk")) {
      println(s"=== $n formatted plan (sf0.1) ===")
      graft.SparkEntry.queries(n)(spark, sf01).explain("formatted")
    }
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[r7f] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (d <- Seq(sf01, dir); n <- names)
      timed(s"$n ${if (d == sf01) "sf0.1" else "sf1"}")(
        graft.SparkEntry.queries(n)(spark, d).count())
    spark.stop()
  }
}
