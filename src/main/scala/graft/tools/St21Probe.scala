package graft.streaming // needs private[streaming]/private[graft] access

import org.apache.spark.sql.SparkSession

/** r17 phase probe for st21's lifecycle: full-index persist, retraction
  * stream drain (4 tombstone micro-batches), serve — wall + job counts. */
object St21Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def phase[T](name: String)(body: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = body
      println(f"[st21probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s jobs=${jobs.get() - j0}")
      r
    }
    // warm pass: full st21 once (codegen + reader), then clear and split
    try graft.SparkEntry.queries("st21_stream_index_delete")(spark, dir).count()
    catch { case e: Throwable => println(s"warm failed: $e") }
    graft.BenchMemos.clearAll()
    System.gc(); Thread.sleep(500)
    // the maintainedRoot body, phase by phase
    val d = graft.core.FsUtil.scratchDir("graft-st21probe")
    val d2 = graft.core.FsUtil.scratchDir("graft-st21probe2")
    // cold pays the Lloyd/PQ/encode/band memos + 4 publishes; warm pays
    // just the 4 publishes — the difference is the training-memo cost
    phase("persist_cold")(graft.operators.AnnIndexStore.persist(spark, dir, d.toString))
    phase("persist_warm")(graft.operators.AnnIndexStore.persist(spark, dir, d2.toString))
    val staged = phase("stage_deletes")(IndexStreamMaintenance.stagedDeletes(spark, dir))
    phase("drain_stream") {
      val stream = spark.readStream
        .schema(IndexStreamMaintenance.idSchema)
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          if (!batch.isEmpty) graft.operators.AnnIndexStore.deleteIds(spark, d.toString, batch.toDF())
        }
        .option("checkpointLocation", EventStreamOps.replayCheckpointDir("st21probe"))
        .queryName("st21probe").start()
      try q.processAllAvailable() finally q.stop()
    }
    phase("serve")(
      graft.operators.AnnIndexStore.serveTopK(spark, dir, d.toString).count())
    spark.stop()
  }
}
