package graft.streaming // probe needs private[streaming] access

import org.apache.spark.sql.SparkSession

/** r17 A/B probe: st20's phase split — staged-rows write, streamed lake
  * build (4 micro-batches of Hilbert-sharded appends), from-disk audit —
  * each with wall time and Spark job count, plus landed file count. */
object St20Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val jobLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long, Long)]()) // id, startMs, endMs
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, j.time)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobLog.add((j.jobId, starts.getOrDefault(j.jobId, j.time), j.time))
    })
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[st20probe] $name: $dt%.2f s jobs=${jobs.get() - j0}")
      r
    }
    // warm pass (codegen + reader), then clear and measure fresh
    LayoutOps_warm(spark, dir)
    graft.BenchMemos.clearAll()
    System.gc(); Thread.sleep(500)
    val staged = phase("stage")(LakeStreamWriter.stagedRows(spark, dir))
    jobLog.clear()
    val root = phase("lake")(LakeStreamWriter.streamedLakeRoot(spark, dir))
    locally {
      import scala.jdk.CollectionConverters._
      val js = jobLog.asScala.toSeq.sortBy(_._2)
      val busy = js.map(j => j._3 - j._2).sum
      val gaps = js.sliding(2).collect { case Seq(a, b) => b._2 - a._3 }.toSeq
      println(s"[st20probe] lake jobs ms: " +
        js.map(j => s"${j._1}:${j._3 - j._2}").mkString(" ") +
        s" busy=${busy}ms gaps=${gaps.mkString(",")}")
    }
    val n = phase("audit")(
      graft.operators.LayoutOps.hilbertTreeAudit(spark, root).count())
    val files = {
      val w = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try w.filter(p => p.toString.endsWith(".parquet")).count()
      finally w.close()
    }
    println(s"[st20probe] rows=$n landed_files=$files staged=$staged")
    spark.stop()
  }

  private def LayoutOps_warm(spark: SparkSession, dir: String): Unit = {
    try graft.SparkEntry.queries("st20_stream_hilbert_sink")(spark, dir).count()
    catch { case _: Throwable => () }
  }
}
