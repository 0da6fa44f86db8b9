package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch stage-split profile of the dedupe candidate pipeline (verify
  * recipe): isolates the memoized docSets build from x3's frequency/prefix
  * stages by differencing memo-cold and memo-warm runs. */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]").appName("graft-dedup-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
    }
    try {
      // warm codegen/readers once
      graft.operators.DedupQueries.x4MinhashLsh(spark, dir).count()
      graft.operators.DedupQueries.x3NgramJaccardPairs(spark, dir).count()
      graft.operators.DedupQueries.clearMemo()
      time("x4 cold (docSets+band+verify)") {
        graft.operators.DedupQueries.x4MinhashLsh(spark, dir).count()
      }
      time("x4 warm (band+verify)") {
        graft.operators.DedupQueries.x4MinhashLsh(spark, dir).count()
      }
      time("x3 warm-sets (freq+prefix)") {
        graft.operators.DedupQueries.x3NgramJaccardPairs(spark, dir).count()
      }
      graft.operators.DedupQueries.clearMemo()
      time("x3 cold (full)") {
        graft.operators.DedupQueries.x3NgramJaccardPairs(spark, dir).count()
      }
      // replicate x3's internal stages to localize the cost
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val sets = graft.operators.Tables.t(spark, dir, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, text) =>
          val hs = graft.operators.DedupQueries.shingleHashes(text)
          (id, hs, hs.length)
        }.toDF("doc_id", "hs", "n").localCheckpoint()
      val threshold = 0.5
      var freqArr: (Array[Long], Array[Long]) = null
      time("stage: freq collect") {
        val rows = sets.select(explode(col("hs")).as("h"))
          .groupBy("h").agg(count(lit(1)).as("f"))
          .filter(col("f") >= 2)
          .orderBy(col("f").desc, col("h"))
          .limit(1 << 20)
          .as[(Long, Long)].collect()
        val byKey = rows.sortBy(_._1)
        freqArr = (byKey.map(_._1), byKey.map(_._2))
        rows.length.toLong
      }
      val bc = spark.sparkContext.broadcast(freqArr)
      val prefix = sets.select(col("doc_id"), col("hs"), col("n")).as[(Long, Array[Long], Int)]
        .flatMap { case (id, hs, n) =>
          val (ks, fs) = bc.value
          def freqOf(h: Long): Long = {
            val i = java.util.Arrays.binarySearch(ks, h)
            if (i >= 0) fs(i) else 1L
          }
          val p = n - math.ceil(threshold * n).toInt + 1
          val sorted = hs.sortBy(h => (freqOf(h), h))
          sorted.iterator.take(p).zipWithIndex.map { case (h, i) => (id, h, n, i) }
        }.toDF("doc_id", "h", "n", "pos")
      time("stage: prefix rows") { prefix.count() }
      val interLb = ceil(lit(threshold / (1 + threshold)) * (col("a.n") + col("b.n")))
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
            greatest(col("a.n"), col("b.n")) * threshold <= least(col("a.n"), col("b.n")) &&
            lit(1) + least(col("a.n") - col("a.pos") - 1, col("b.n") - col("b.pos") - 1) >= interLb)
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .dropDuplicates("doc_a", "doc_b")
      time("stage: candidate join") { cands.count() }
      val verified = cands
        .join(sets.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("n").as("na")), "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("n").as("nb")), "doc_b")
        .withColumn("inter",
          graft.functions.SortedIntersectSize.sortedIntersectSize(col("ha"), col("hb")))
        .withColumn("jaccard",
          round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
        .filter(col("jaccard") >= threshold)
      time("stage: verify") { verified.count() }
    } finally spark.stop()
  }
}
