package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 scratch probe: what outputPartitioning do localCheckpoint /
  * persist report for a hash-repartitioned frame, and does a join reuse it? */
object R8Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("r8probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = (1L to 10000L).map(i => (i % 97, i)).toDF("src", "dst")

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ck = base.repartition(col("src")).localCheckpoint()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    println("== localCheckpoint plan ==")
    println(ck.queryExecution.executedPlan)
    println("partitioning: " + ck.queryExecution.executedPlan.outputPartitioning)

    val pe = base.repartition(col("src")).persist()
    pe.count()
    println("== persist partitioning: " + pe.queryExecution.executedPlan.outputPartitioning)

    val ranks = (0L to 96L).map(k => (k, k * 0.5)).toDF("part", "r")
    val j = ck.join(ranks, ck("src") === ranks("part"))
    j.collect()
    println("== join over checkpoint ==")
    println(j.queryExecution.executedPlan)

    val j2 = pe.join(ranks, pe("src") === ranks("part"))
    j2.collect()
    println("== join over persist ==")
    println(j2.queryExecution.executedPlan)
    spark.stop()
  }
}
