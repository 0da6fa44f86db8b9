package graft.tools
import org.apache.spark.sql.SparkSession
// dev probe: filtered recall@3 vs nprobe (round-11 v22 sizing)
object V22Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val e = spark.read.parquet(s"$sf/embeddings.parquet")
        .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toMap
      def cos(a: Array[Float], b: Array[Float]): Double =
        a.indices.map(i => a(i).toDouble * b(i).toDouble).sum
      for (np <- Seq(1, 2, 3, 4)) {
        val out = graft.operators.SimilarityQueries.v22FilteredAnn(spark, sf, np)
          .as[(Long, Long, Long, Double, Int)].collect()
        val queries = out.map(_._1).distinct
        var hit = 0; var want = 0
        queries.foreach { q =>
          val truth = e.keys.filter(n => n != q && n % 3 == q % 3).toSeq
            .map(n => (cos(e(q), e(n)), n)).sortBy { case (s, n) => (-s, n) }
            .take(3).map(_._2).toSet
          val got = out.filter(_._1 == q).map(_._2).toSet
          hit += truth.intersect(got).size; want += truth.size
        }
        println(s"[v22] $sf nprobe=$np recall@3 = ${hit.toDouble / want}")
      }
    }
    spark.stop()
  }
}
