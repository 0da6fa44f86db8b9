package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSet else Set("q1_pricing_summary","q3_top_revenue","q5_region_revenue","w1_top_per_brand","c1_position_lookup","x4_minhash_lsh","v1_cosine_topk")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    // x3 memoizes its verified pairs behind a localCheckpoint, so the
    // registered query's plan is a bare ExistingRDD scan — dump the
    // pre-checkpoint build instead (the plan that actually runs cold)
    val overrides = Map[String, SparkSession => org.apache.spark.sql.DataFrame](
      "x3_ngram_jaccard" -> (s => graft.operators.DedupQueries.x3Build(s, sf)))
    // pseudo-targets: plans worth auditing that are not registered driver
    // queries — the streamed lake's compaction fold (the maintenance verb's
    // one job: whole-tree scan -> range-cluster on hshard -> partitioned
    // rewrite; dumped pre-write, the read+shuffle side that scales)
    val pseudo = Map[String, SparkSession => org.apache.spark.sql.DataFrame](
      // the n-family's memoized edge build (pre-checkpoint — the memo
      // returns an ExistingRDD scan) and the Hilbert writers' pre-write
      // shard frame: the r17 optimization evidence plans
      "copurchase_edges_build" -> (s => graft.operators.GraphOps.edgeBuild(s, sf)),
      "hilbert_land_fold" -> (s =>
        graft.operators.LayoutOps.hilbertShardFrame(
          graft.operators.LayoutOps.quantizedLineitem(s, sf))),
      "compact_shards_fold" -> { s =>
        import org.apache.spark.sql.functions.col
        val root = graft.streaming.LakeStreamWriter.streamedLakeRoot(s, sf)
        s.read.parquet(root)
          .withColumn("hshard", col("hshard").cast("long"))
          .repartition(col("hshard"))
      })
    val targets: Seq[(String, SparkSession => org.apache.spark.sql.DataFrame)] =
      graft.SparkEntry.queries.toSeq.collect { case (n, fn) if names(n) =>
        n -> overrides.getOrElse(n, (s: SparkSession) => fn(s, sf))
      } ++ pseudo.toSeq.filter(p => names(p._1))
    targets.foreach { case (n, fn) =>
      println(s"\n########## $n")
      println(fn(spark).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
