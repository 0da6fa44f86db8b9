package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-9 scratch probe: can `repartition(key).persist(DISK_ONLY)` replace
  * the AQE-off localCheckpoint in GraphOps.coPartitionedCheckpoint — i.e.
  * does the cached plan keep HashPartitioning(key) under AQE-on, and does a
  * downstream join then skip re-exchanging the cached (big) side? */
object R9Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("r9probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    println("canChangeCachedPlanOutputPartitioning = " +
      spark.conf.get("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))

    val base = (1L to 10000L).map(i => (i % 97, i)).toDF("src", "dst")
    val pe = base.repartition(col("src")).persist(StorageLevel.DISK_ONLY)
    pe.count()
    println("== persist(DISK_ONLY) partitioning: " +
      pe.queryExecution.executedPlan.outputPartitioning)

    val ranks = (0L to 96L).map(k => (k, k * 0.5)).toDF("part", "r")
    val j = pe.join(ranks, pe("src") === ranks("part"))
    j.collect()
    println("== join over persisted frame (AQE on) ==")
    println(j.queryExecution.executedPlan)
  }
}
