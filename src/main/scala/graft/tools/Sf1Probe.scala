package graft.tools
import org.apache.spark.sql.SparkSession

/** Scale-finding probes over a ScaleUp-built corpus: the two operators the
  * sf1 run flagged, re-measured after their fixes (x6's 16-bit bands) and
  * across the quantizer-k dial (v7) — the numbers recorded in BASELINE.md's
  * sf1 section. Usage: runMain graft.tools.Sf1Probe [scaledDir] */
object Sf1Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    def timed(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sf1] $label: rows=$n time=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // warm the scan + codegen paths once
    graft.operators.DedupQueries.x6EmbeddingCosine(spark, dir).count()
    graft.operators.DedupQueries.clearMemo()
    timed("x6 (2x16-bit bands)")(graft.operators.DedupQueries.x6EmbeddingCosine(spark, dir).count())
    timed("v7 k=10 (fixed-k trap)")(graft.operators.SimilarityQueries.v7KnnKmeans(spark, dir, 10, 3).count())
    timed("v7 k=32 (k scaled ~sqrt(10x))")(graft.operators.SimilarityQueries.v7KnnKmeans(spark, dir, 32, 3).count())
    timed("v7 k=70 (k ~ sqrt(N))")(graft.operators.SimilarityQueries.v7KnnKmeans(spark, dir, 70, 3).count())
    spark.stop()
  }
}
