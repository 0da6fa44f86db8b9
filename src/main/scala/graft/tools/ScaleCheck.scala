package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.DedupQueries

/** Scale smoke: run the near-dup operators on an N-x replicated documents
  * corpus (built outside the repo in /tmp) and report wall time + row
  * counts, to confirm the pipelines scale ~linearly in corpus size.
  * Usage: runMain graft.tools.ScaleCheck <dirWithDocumentsParquet> */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/scale10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[scale] docs=" + spark.read.parquet(s"$dir/documents.parquet").count())
    Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "x3_ngram_jaccard" -> (DedupQueries.x3NgramJaccardPairs _),
      "x4_minhash_lsh" -> (DedupQueries.x4MinhashLsh _),
      "x5_simhash_pairs" -> (DedupQueries.x5SimhashPairs _)
    ).foreach { case (name, fn) =>
      fn(spark, dir).count() // warm: codegen + JIT
      val t0 = System.nanoTime()
      val rows = fn(spark, dir).count()
      println(f"[scale] $name: rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
