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
    engineThroughput(spark)
    spark.stop()
  }

  /** Bulk ingest + reconstruct throughput through DedupeEngine (the
    * reference's Write/Get path): 120 x 512 KiB objects (100 unique + 20
    * duplicates), large-file chunking profile (reference README.md:154-157).
    */
  private def engineThroughput(spark: SparkSession): Unit = {
    import graft.core.DedupeSettings
    chunkerOnly()
    engineThroughputWith(spark, DedupeSettings(32768, 262144, 512, 2))
    engineThroughputWith(spark,
      DedupeSettings(32768, 262144, 512, 2, DedupeSettings.GearProfile))
  }

  /** Single-thread pure-chunker throughput: isolates the boundary-rule cost
    * from Spark/parquet overheads (the reference is single-threaded, so this
    * is the apples-to-apples number against its Write path). */
  private def chunkerOnly(): Unit = {
    import graft.core.{Chunker, DedupeSettings, GearChunker}
    val s = DedupeSettings(32768, 262144, 512, 2)
    val r = new scala.util.Random(5)
    val data = new Array[Byte](32 * 1024 * 1024); r.nextBytes(data)
    val mb = data.length / 1024.0 / 1024.0
    Chunker.boundaries(data, s); GearChunker.boundaries(data, s.minChunkSize, s.maxChunkSize, s.gearMaskBits) // warm
    val t0 = System.nanoTime()
    val nMd5 = Chunker.boundaries(data, s).size
    val md5S = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val nGear = GearChunker.boundaries(data, s.minChunkSize, s.maxChunkSize, s.gearMaskBits).size
    val gearS = (System.nanoTime() - t1) / 1e9
    println(f"[scale] chunker md5-window: $mb%.0f MB in $md5S%.2f s = ${mb / md5S}%.1f MB/s ($nMd5 chunks)")
    println(f"[scale] chunker gear:       $mb%.0f MB in $gearS%.2f s = ${mb / gearS}%.1f MB/s ($nGear chunks)")
  }

  private def engineThroughputWith(spark: SparkSession,
      settings: graft.core.DedupeSettings): Unit = {
    import spark.implicits._
    import graft.engine.DedupeEngine
    val idx = java.nio.file.Files.createTempDirectory("scale_idx").toString
    val eng = DedupeEngine.create(spark, idx, settings)
    val objKB = 512
    val uniques = 100
    val keys = (0 until uniques).map(i => s"obj$i") ++ (0 until 20).map(i => s"dup$i")
    val src = spark.createDataset(keys.zipWithIndex).repartition(8)
      .map { case (k, i) =>
        val seed = if (k.startsWith("dup")) i % 5 else 1000 + i // dups repeat 5 seeds
        val r = new scala.util.Random(seed)
        val b = new Array[Byte](objKB * 1024); r.nextBytes(b); (k, b)
      }
    val mb = keys.size * objKB / 1024.0
    val t0 = System.nanoTime()
    eng.ingest(src)
    val ingestS = (System.nanoTime() - t0) / 1e9
    val st = eng.indexStats()
    val t1 = System.nanoTime()
    val rebuilt = eng.reconstructAll().count()
    val readS = (System.nanoTime() - t1) / 1e9
    println(f"[scale] engine[${settings.profile}] ingest: $mb%.0f MB in $ingestS%.2f s = " +
      f"${mb / ingestS}%.1f MB/s (objects=${st.objectCount} chunks=${st.chunkCount} ratioX=${st.ratioX}%.2f)")
    println(f"[scale] engine[${settings.profile}] reconstructAll: $rebuilt objs in $readS%.2f s = ${mb / readS}%.1f MB/s")
  }
}
