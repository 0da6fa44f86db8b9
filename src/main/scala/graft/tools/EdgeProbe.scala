package graft.operators // probe needs private[operators] access

import org.apache.spark.sql.SparkSession

/** r17 A/B probe: wall time + job count of the co-purchase edge memo
  * build alone (the cost n1's bench row pays first). Run twice around a
  * code change (git stash A/B) for a like-with-like comparison. */
object EdgeProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobLog = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long)]())
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); starts.put(j.jobId, j.time)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobLog.add((j.jobId, j.time - starts.getOrDefault(j.jobId, j.time)))
    })
    // warm the reader/codegen once, then measure a fresh build
    GraphOps.coPurchaseEdges(spark, dir).count()
    GraphOps.clearMemo()
    System.gc(); Thread.sleep(500)
    val j0 = jobs.get()
    val c0 = graft.Bench.cpuSample()
    val t0 = System.nanoTime()
    val e = GraphOps.coPurchaseEdges(spark, dir)
    val n = e.count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"[edgeprobe] memo partitions=${e.rdd.getNumPartitions} " +
      s"stats=${e.queryExecution.optimizedPlan.stats.sizeInBytes}")
    val st = (for (a <- c0; b <- graft.Bench.cpuSample())
      yield { val (s, f) = graft.Bench.cpuDelta(a, b); s" steal=$s foreign=$f" }).getOrElse("")
    println(f"[edgeprobe] edges=$n build=$dt%.2f s jobs=${jobs.get() - j0}$st")
    // n1 with the memo hot: the downstream-consumption cost alone
    jobLog.clear()
    val t1 = System.nanoTime()
    val c1 = graft.Bench.cpuSample()
    GraphOps.n1Pagerank(spark, dir).count()
    val dt1 = (System.nanoTime() - t1) / 1e9
    val st1 = (for (a <- c1; b <- graft.Bench.cpuSample())
      yield { val (s, f) = graft.Bench.cpuDelta(a, b); s" steal=$s foreign=$f" }).getOrElse("")
    locally {
      import scala.jdk.CollectionConverters._
      println(f"[edgeprobe] n1_hot=$dt1%.2f s$st1 jobs ms: " +
        jobLog.asScala.toSeq.sortBy(_._1).map(j => s"${j._1}:${j._2}").mkString(" "))
    }
    spark.stop()
  }
}
