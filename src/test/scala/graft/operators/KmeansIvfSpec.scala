package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Lloyd's k-means quantizer + IVF probe, asserted on data where clusters
  * actually exist. (The testdata embeddings table is near-random across
  * labels — within-label cosine ~0.004 — so ANN recall CANNOT be asserted
  * there; this spec builds a deterministic clustered corpus instead.) */
class KmeansIvfSpec extends SparkSpec {

  private val dim = 8
  private val nClusters = 5
  private val perCluster = 40

  /** Deterministic clustered corpus: unit-norm cluster centers spread on
    * axes, members = center + small deterministic noise, re-normalized. */
  private def clustered() = {
    import spark.implicits._
    def normed(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until perCluster
    } yield {
      val center = Array.tabulate(dim)(d => if (d == c) 1.0 else 0.2 * ((c + d) % 3))
      val r = new scala.util.Random(c * 1000 + i)
      val v = center.map(x => x + 0.05 * r.nextGaussian())
      (c.toLong * perCluster + i, normed(v), c)
    }
    // vec_id 0..4 are one member of each cluster => k-means init spans all
    // clusters (ids 0, 40, 80... belong to clusters 0..4; remap so the k
    // lowest ids hit distinct clusters)
    val remapped = rows.zipWithIndex.map { case ((_, v, c), i) =>
      val id = if (i % perCluster == 0) c.toLong else nClusters.toLong + i.toLong
      (id, v, c)
    }
    remapped.toDF("vec_id", "embedding", "true_cluster")
  }

  test("k-means converges to the planted clusters (purity >= 0.95)") {
    val df = clustered().localCheckpoint()
    val cents = SimilarityQueries.kmeansCentroids(spark, df, nClusters, 5)
    assert(cents.count() == nClusters.toLong, "no cluster may collapse on clustered data")
    // assign every vector to its nearest final centroid; each k-means cell
    // should be dominated by one true cluster
    val cdf = broadcast(cents.withColumn("cn2",
      graft.operators.Tables.dot(col("centroid"), col("centroid"))))
    val assigned = df.crossJoin(cdf)
      .withColumn("score",
        graft.operators.Tables.dot(col("embedding"), col("centroid")) - lit(0.5) * col("cn2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score").desc, col("cell"))))
      .filter(col("rk") === 1)
    val purity = assigned.groupBy("cell", "true_cluster").count()
      .withColumn("r", row_number().over(
        Window.partitionBy("cell").orderBy(col("count").desc)))
      .filter(col("r") === 1)
      .agg(sum("count")).head().getLong(0).toDouble / (nClusters * perCluster)
    assert(purity >= 0.95, s"k-means purity $purity below 0.95")
  }

  test("v7 picks each vector's true within-kmeans-cell nearest neighbor (brute force)") {
    import spark.implicits._
    // independent reconstruction on the real testdata: same quantizer via
    // kmeansCentroids, assignment + nearest-sibling brute-forced in the JVM
    // with the identical left-to-right double fold dot_f uses
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val cents = SimilarityQueries.kmeansCentroids(spark,
        spark.read.parquet(s"$sfDir/embeddings.parquet"), 10, 3)
      .as[(Int, Seq[Double])].collect()
    def dotFD(a: Array[Float], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }; s
    }
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }; s
    }
    val cn2 = cents.map { case (c, v) => c -> v.foldLeft(0.0)((a, x) => a + x * x) }.toMap
    val cellOf = e.map { case (id, emb) =>
      id -> cents.map { case (c, v) => (dotFD(emb, v) - 0.5 * cn2(c), c) }
        .minBy { case (s, c) => (-s, c) }._2
    }.toMap
    val expected = e.flatMap { case (id, emb) =>
      val sibs = e.filter { case (oid, _) => oid != id && cellOf(oid) == cellOf(id) }
      if (sibs.isEmpty) None
      else {
        val (nid, s) = sibs.map { case (oid, ov) => (oid, dotFF(emb, ov)) }
          .minBy { case (oid, s) => (-s, oid) }
        // HALF_UP to match Spark's round()
        Some((id, cellOf(id), nid,
          BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    }.sortBy(_._1).toSeq
    val got = SimilarityQueries.v7KnnKmeans(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.nonEmpty && got == expected)
  }

  test("v8 incremental assignment equals brute force against old-slice centroids") {
    val e = Tables.t(spark, sfDir, "embeddings")
    val old = e.filter(col("vec_id") % 7 =!= 0)
    val cents = SimilarityQueries.kmeansCentroids(spark, old, 10, 3)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val fresh = e.filter(col("vec_id") % 7 === 0).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(fresh.nonEmpty && cents.nonEmpty)
    val expected = fresh.map { case (id, emb) =>
      val scored = cents.map { case (cell, c) =>
        var s = 0.0; var i = 0
        while (i < emb.length) { s += emb(i) * c(i); i += 1 }
        var cn = 0.0; i = 0
        while (i < c.length) { cn += c(i) * c(i); i += 1 }
        (cell, s - 0.5 * cn)
      }
      // rank-1 with ties to the LOWEST cell, matching the window's order
      id -> scored.maxBy { case (cell, s) => (s, -cell) }._1
    }.toMap
    val got = SimilarityQueries.v8IncrementalIvf(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === expected)
    // the quantizer must have been trained WITHOUT the new slice: its init
    // cells are old-slice ids only (no multiple of 7 among them)
    assert(cents.forall(_._1 % 7 != 0))
  }

  test("IVF probe recall@3 >= 0.9 vs brute-force ground truth on clustered data") {
    import spark.implicits._
    val df = clustered().localCheckpoint()
    val cents = SimilarityQueries.kmeansCentroids(spark, df, nClusters, 5)
    val cdf = broadcast(cents.withColumn("cn2",
      graft.operators.Tables.dot(col("centroid"), col("centroid"))))
    val assigned = df.crossJoin(cdf)
      .withColumn("score",
        graft.operators.Tables.dot(col("embedding"), col("centroid")) - lit(0.5) * col("cn2"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("score").desc, col("cell"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"))
      .localCheckpoint()
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    // IVF: probe own cell only
    val ivf = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", graft.operators.Tables.dot(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    // brute force: full corpus
    val truth = assigned.crossJoin(broadcast(q.drop("cell")))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", graft.operators.Tables.dot(col("embedding"), col("qv")))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rank") <= 3)
      .select("query_id", "vec_id")
      .as[(Long, Long)].collect().toSet
    val recall = (ivf & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"IVF probe recall@3 was $recall vs brute force")
  }

  test("hyperplane-LSH candidates recover v1's exact top-5 pairs (recall@5) on clustered data") {
    import spark.implicits._
    // run the REAL v1 query over the clustered corpus staged as an
    // embeddings table, so the exact top-k ground truth and the LSH
    // candidate set come from the production code paths
    val tmp = java.nio.file.Files.createTempDirectory("ann_recall").toString
    val corpus = clustered().select(col("vec_id"), col("embedding"))
    corpus.write.parquet(s"$tmp/embeddings.parquet")
    val exact = SimilarityQueries.v1CosineTopK(spark, tmp)
      .select(least(col("query_id"), col("neighbor_id")).as("a"),
        greatest(col("query_id"), col("neighbor_id")).as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    val candidates = SimilarityQueries
      .annCandidatePairs(spark, graft.operators.Tables.t(spark, tmp, "embeddings"))
      .select(col("vec_a"), col("vec_b")).as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = exact.count(candidates.contains).toDouble / exact.size
    // 4 bands x 16 planes over near-duplicate cluster members: the banded
    // buckets must surface nearly every true top-5 pair without all-pairs
    assert(recall >= 0.85, s"LSH candidate recall@5 was $recall vs v1 exact top-5")
    // and the candidate set must stay sub-quadratic on clustered data
    val allPairs = corpus.count() * (corpus.count() - 1) / 2
    assert(candidates.size < allPairs / 2,
      s"candidate set ${candidates.size} is not meaningfully sub-quadratic (all-pairs $allPairs)")
  }

  test("v18 multi-probe: probe sets nest, candidates grow, recall table measures both dials") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    def cands(np: Int): Set[(Long, Long)] =
      SimilarityQueries.ivfAdcScored(spark, dir, np)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c1 = cands(1)
    val c4 = cands(4)
    // rank ≤ 1 cells ⊂ rank ≤ 4 cells per query, so the candidate stream
    // is nested by construction — the structural half of v17's contract
    assert(c1.subsetOf(c4), "nprobe=1 candidates must nest inside nprobe=4")
    assert(c4.size > c1.size, "probing 3 more cells must add candidates")
    // v18's output is the exact-rerank shape: per query ≤5 rows, sims
    // descending with rank, and every neighbor came through a probed cell
    val out = SimilarityQueries.v18Multiprobe(spark, dir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sorted.reverse.toSeq == sims.toSeq, "rank follows exact sim desc")
    }
    assert(out.forall(r => c4.contains((r.getLong(0), r.getLong(1)))),
      "every re-ranked neighbor came through the multi-probe candidate set")
    // the audit table has one block per dial setting over the same queries
    val audit = SimilarityQueries.v17RecallAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val np1 = audit.filter(_._1 == 1L).map(t => t._2 -> t._3).toMap
    val np4 = audit.filter(_._1 == 4L).map(t => t._2 -> t._3).toMap
    assert(np1.keySet == np4.keySet, "both blocks audit the same query set")
    // mean recall must not FALL when the dial opens on this corpus (the
    // per-query boundary is measured, not assumed — see v17's scaladoc)
    assert(np4.values.sum >= np1.values.sum,
      s"mean recall at nprobe=4 (${np4.values.sum}) below nprobe=1 (${np1.values.sum})")
  }

  test("v15 auto-nlist derives k = max(10, floor(sqrt(N))) and partitions the corpus") {
    val dir = "/root/testdata/sf0.001"
    val n = graft.operators.Tables.t(spark, dir, "embeddings").count()
    val expectedK = math.max(10L, math.floor(math.sqrt(n.toDouble)).toLong)
    val got = SimilarityQueries.v15AutoNlist(spark, dir).collect()
    assert(got.forall(_.getLong(2) == expectedK), "nlist column must carry the derived k")
    // every vector lands in exactly one cell; the occupancy table sums to N
    assert(got.map(_.getLong(1)).sum == n)
    // the auto-scale actually bites: with N=500 the derived k exceeds the
    // fixed-10 floor and the quantizer keeps most of those cells populated
    assert(expectedK > 10, s"testdata should exercise the sqrt branch (N=$n)")
    assert(got.length > 10 && got.length <= expectedK,
      s"expected >10 and <= $expectedK populated cells, got ${got.length}")
  }
}
