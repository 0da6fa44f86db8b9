package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan + scale evidence for the late round-7 additions: v10 (PQ ADC
  * search), t4 (gap-fill + LOCF), y16 (native NFC), z5 (z-order audit).
  * Dumps formatted plans at sf0.1 for the EXPLAIN audit, then times each
  * at sf0.1 vs the ScaleUp-built sf1 corpus (warm shapes).
  * Usage: runMain graft.tools.R7LateProbe [scaledDir] */
object R7LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = "/root/testdata/sf0.1"
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[r7l] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("=== v10 formatted plan (sf0.1) ===")
    graft.operators.SimilarityQueries.v10PqAdcSearch(spark, sf01).explain("formatted")
    println("=== t4 formatted plan (sf0.1) ===")
    graft.operators.AnalyticsQueries.t4GapFill(spark, sf01).explain("formatted")
    println("=== y16 formatted plan (sf0.1) ===")
    graft.operators.TextQueries.y16NfcClean(spark, sf01).explain("formatted")
    println("=== z5 formatted plan (sf0.1) ===")
    graft.operators.LayoutOps.z5ZorderLayout(spark, sf01).explain("formatted")
    for (d <- Seq(sf01, dir)) {
      val tag = if (d == sf01) "sf0.1" else "sf1"
      timed(s"v10_pq_adc $tag")(
        graft.operators.SimilarityQueries.v10PqAdcSearch(spark, d).count())
      timed(s"t4_gap_fill $tag")(
        graft.operators.AnalyticsQueries.t4GapFill(spark, d).count())
      timed(s"y16_nfc_clean $tag")(
        graft.operators.TextQueries.y16NfcClean(spark, d).count())
      timed(s"z5_zorder_layout $tag")(
        graft.operators.LayoutOps.z5ZorderLayout(spark, d).count())
    }
    spark.stop()
  }
}
