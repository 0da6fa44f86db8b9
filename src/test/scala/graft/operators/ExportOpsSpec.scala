package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** z8's round-trip contracts: the landed shards carry exactly the
  * pre-write composition, token accounting closes (every shard but the
  * last fills to ShardTokens; totals equal the survivor corpus), and the
  * on-disk layout is one partition directory per shard. */
class ExportOpsSpec extends SparkSpec {

  test("z8 manifest read from disk equals the pre-write composition") {
    val fromDisk = ExportOps.z8ShardExport(spark, sfDir).collect()
      .map(r => (r.getAs[Number]("shard_id").longValue(), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet
    val preWrite = ExportOps.shardRows(spark, sfDir)
      .groupBy("shard_id", "source")
      .agg(count(lit(1)).as("n_docs"), sum("take").as("fill_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(fromDisk.nonEmpty && fromDisk == preWrite)
  }

  test("z8 token accounting closes against the survivor corpus") {
    val rows = ExportOps.shardRows(spark, sfDir)
    val perShard = rows.groupBy("shard_id").agg(sum("take").as("fill"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val lastShard = perShard.map(_._1).max
    perShard.foreach { case (sid, fill) =>
      if (sid != lastShard)
        assert(fill == ExportOps.ShardTokens, s"shard $sid must fill exactly")
      else assert(fill > 0 && fill <= ExportOps.ShardTokens)
    }
    // total fill == total survivor tokens (nothing lost, nothing doubled)
    val dropped = DedupQueries.x7DupClusters(spark, sfDir)
      .filter(col("doc_id") =!= col("cluster_id")).select("doc_id")
    val survTokens = Tables.t(spark, sfDir, "documents")
      .join(dropped, Seq("doc_id"), "left_anti")
      .select(TextQueries.tokenCount(col("text")).as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(perShard.map(_._2).sum == survTokens)
    // and the landed layout is one partition dir per shard
    val root = ExportOps.exportRoot(spark, sfDir)
    val shardDirs = new scala.collection.mutable.ArrayBuffer[String]()
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(root))
    try s.forEach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("shard_id=")) shardDirs += n
    } finally s.close()
    assert(shardDirs.map(_.stripPrefix("shard_id=").toLong).sorted.toSeq
      == perShard.map(_._1).toSeq)
  }
}
