package graft.tools
import org.apache.spark.sql.SparkSession

/** Scale probes for the round-7 additions over the ScaleUp-built sf1
  * corpus (10x sf0.1): y12 (regex scrub — one corpus pass), z3 (sequence
  * packing — two passes over longs), st8 (custom-state sessionizer —
  * state scales with open sessions, not events), plus z3's formatted plan
  * at sf0.1 for the EXPLAIN audit.
  * Usage: runMain graft.tools.R7Probe [scaledDir] */
object R7Probe {
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
      println(f"[r7] $label: rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println("=== z3 formatted plan (sf0.1) ===")
    graft.operators.TextQueries.z3SequencePack(spark, sf01).explain("formatted")
    // warm scan/codegen once per query shape, then measure sf0.1 vs sf1
    for (d <- Seq(sf01, dir)) {
      val tag = if (d == sf01) "sf0.1" else "sf1"
      timed(s"y12_pii_scrub $tag")(
        graft.operators.TextQueries.y12PiiScrub(spark, d).count())
      timed(s"z3_sequence_pack $tag")(
        graft.operators.TextQueries.z3SequencePack(spark, d).count())
      timed(s"st8_custom_sessions $tag")(
        graft.streaming.EventStreamOps.runToMemoryAppend(spark, s"$d/events.parquet",
          s"st8p_${System.nanoTime()}", graft.streaming.EventStreamOps.customSessions).count())
      timed(s"v2_ann_lsh $tag (4x16 bands)")(
        graft.operators.SimilarityQueries.v2AnnLsh(spark, d).count())
    }
    spark.stop()
  }
}
