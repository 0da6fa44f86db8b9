package graft.tools

import graft.core.DedupeSettings
import graft.engine.DedupeEngine
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path}

/** Bulk-ingest throughput anchor (BASELINE.md): stage a ~1 GiB synthetic
  * file corpus with REAL cross-object duplication, then time the engine's
  * distributed round-trip — `ingestDirectory` → `indexStats` → `exportAll`
  * — for BOTH chunker profiles at local[32], reporting MB/s, dedupe ratio
  * and Spark job counts (the work-shape witness: bulk ingest must stay a
  * bounded number of jobs, not a job per file).
  *
  * Corpus shape: `nFiles` files × 4 MiB in 64 KiB blocks, alternating
  * 512 KiB RUNS: even runs derive from the block index alone (shared
  * across EVERY file), odd runs from (fileIdx, blockIdx) (unique to their
  * file) — each object interleaves globally-duplicated passages with
  * never-seen content, so the CDC chunker must dedupe at CHUNK
  * granularity, resynchronizing inside each shared run (a whole-file-
  * duplicate corpus would let a trivial object-hash dedupe score the
  * same ratio; single-block sharing never gives the chunker room to
  * realign). Upper bound ~2× logical/physical, less the straddle loss
  * at run boundaries — the measured gap IS the chunker's realignment
  * cost, worth recording.
  *
  * `cold` mode (the page-cache caveat, BASELINE.md): a ≤128 GiB corpus on
  * this host fits in RAM, so after staging, every "disk read" the timed
  * ingest does is a page-cache hit — the published MB/s could overstate a
  * cold 100 TB scan where reads genuinely hit storage. With `cold`, the
  * tool syncs and writes 3 to /proc/sys/vm/drop_caches (root-writable in
  * this sandbox — verified r17) immediately before EACH timed phase, so
  * ingest reads the corpus from disk and export re-reads the just-written
  * index from disk. warm vs cold delta = what the page cache was donating.
  *
  * Usage: tools/jrun.sh graft.tools.IngestThroughput [nFiles=256] [cold]
  */
object IngestThroughput {

  private final class JobCounter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
  }

  /** Flush dirty pages, then evict the page cache (+dentries/inodes).
    * Returns false (and leaves a note) where the proc file isn't writable
    * — callers report "cold" only when the eviction actually happened. */
  private def dropPageCache(): Boolean =
    try {
      new ProcessBuilder("sync").inheritIO().start().waitFor()
      Files.write(java.nio.file.Paths.get("/proc/sys/vm/drop_caches"),
        "3\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      true
    } catch {
      case e: Exception =>
        println(s"[ingest] WARN drop_caches unavailable (${e.getClass.getSimpleName}): " +
          "timings are warm-cache despite cold mode")
        false
    }

  private def stageCorpus(nFiles: Int): (Path, Long) = {
    val root = Files.createTempDirectory("graft-ingest-corpus")
    val blocksPerFile = 64
    val blockBytes = 64 * 1024
    var total = 0L
    for (f <- 0 until nFiles) {
      val out = new java.io.BufferedOutputStream(
        Files.newOutputStream(root.resolve(f"obj-$f%05d.bin")), 1 << 20)
      try {
        for (b <- 0 until blocksPerFile) {
          val seed = if ((b / 8) % 2 == 0) b.toLong else (f.toLong << 32) | b.toLong
          val rnd = new java.util.SplittableRandom(seed)
          val block = new Array[Byte](blockBytes)
          var i = 0
          while (i < blockBytes) {
            val v = rnd.nextLong()
            var s = 0
            while (s < 8 && i < blockBytes) { block(i) = (v >>> (8 * s)).toByte; i += 1; s += 1 }
          }
          out.write(block)
          total += blockBytes
        }
      } finally out.close()
    }
    (root, total)
  }

  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(256)
    val cold = args.lift(1).contains("cold")
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-ingest-throughput")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (corpus, logicalBytes) = stageCorpus(nFiles)
    val mb = logicalBytes / (1024.0 * 1024.0)
    println(f"[ingest] corpus: $nFiles files, $mb%.0f MiB staged at $corpus")
    for (profile <- Seq(DedupeSettings.Md5Profile, DedupeSettings.GearProfile)) {
      val idx = Files.createTempDirectory(s"graft-ingest-idx-$profile")
      graft.core.FsUtil.deleteRecursively(idx) // create() wants a fresh path
      val counter = new JobCounter
      spark.sparkContext.addSparkListener(counter)
      val eng = DedupeEngine.create(spark, idx.toString,
        DedupeSettings(profile = profile))
      def timed[T](label: String)(body: => T): T = {
        if (cold) {
          val ok = dropPageCache()
          println(s"[ingest] $profile page cache ${if (ok) "EVICTED" else "NOT evicted"} before $label")
        }
        val j0 = counter.jobs.get()
        val t0 = System.nanoTime()
        val out = body
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[ingest] $profile%-10s $label%-12s ${dt}%7.2f s  " +
          f"${mb / dt}%7.1f MB/s  jobs=${counter.jobs.get() - j0}")
        out
      }
      timed("ingest")(eng.ingestDirectory(corpus.toString))
      val stats = eng.indexStats()
      println(f"[ingest] $profile%-10s stats: objects=${stats.objectCount} " +
        f"chunks=${stats.chunkCount} logical=${stats.logicalBytes} " +
        f"physical=${stats.physicalBytes} ratio=${stats.ratioX}%.2fx")
      assert(stats.logicalBytes == logicalBytes,
        s"ingest lost bytes: ${stats.logicalBytes} != $logicalBytes")
      val exportDir = Files.createTempDirectory(s"graft-ingest-out-$profile")
      val n = timed("export")(eng.exportAll(exportDir.toString))
      assert(n == nFiles.toLong, s"export wrote $n of $nFiles objects")
      // byte-identity spot check on three objects (first/middle/last)
      for (f <- Seq(0, nFiles / 2, nFiles - 1)) {
        val name = f"obj-$f%05d.bin"
        val a = Files.readAllBytes(corpus.resolve(name))
        val b = Files.readAllBytes(exportDir.resolve(name))
        assert(java.util.Arrays.equals(a, b), s"round-trip mismatch on $name")
      }
      println(s"[ingest] $profile round-trip byte-identity OK (3 sampled objects)")
      spark.sparkContext.removeSparkListener(counter)
      graft.core.FsUtil.deleteRecursively(exportDir)
      graft.core.FsUtil.deleteRecursively(idx)
    }
    graft.core.FsUtil.deleteRecursively(corpus)
    spark.stop()
  }
}
