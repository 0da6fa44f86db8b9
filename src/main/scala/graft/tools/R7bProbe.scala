package graft.tools
import org.apache.spark.sql.SparkSession

/** Plan + scale evidence for the late round-7 batch: k2 (AQE skew split),
  * t6 (rolling anomaly flags), w8 (attribution), m5 (multimodal pack).
  * Dumps formatted plans at sf0.1, then times each at sf0.1 vs the
  * ScaleUp-built sf1 corpus (warm shapes).
  * Usage: runMain graft.tools.R7bProbe [scaledDir] */
object R7bProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val sf01 = "/root/testdata/sf0.1"
    val names = Seq("k2_aqe_skew", "t6_anomaly_flags", "w8_attribution",
      "m5_multimodal_pack")
    for (n <- Seq("t6_anomaly_flags", "w8_attribution", "m5_multimodal_pack")) {
      println(s"=== $n formatted plan (sf0.1) ===")
      graft.SparkEntry.queries(n)(spark, sf01).explain("formatted")
    }
    // k2's interesting plan is the EXECUTED one (AQE final, post-split);
    // collect() the frame ITSELF — count() spawns a separate query
    // execution and leaves this one's AQE plan un-finalized
    for (d <- Seq(sf01 -> "sf0.1", dir -> "sf1")) {
      val k2 = graft.SparkEntry.queries("k2_aqe_skew")(spark, d._1)
      k2.collect()
      println(s"=== k2_aqe_skew executed plan (${d._2}, AQE final) ===")
      println(k2.queryExecution.executedPlan.toString)
    }
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[r7b] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (d <- Seq(sf01, dir); n <- names)
      timed(s"$n ${if (d == sf01) "sf0.1" else "sf1"}")(
        graft.SparkEntry.queries(n)(spark, d).count())
    spark.stop()
  }
}
