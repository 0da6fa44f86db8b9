package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/**
 * Evidence for the co-located join story: when both fact tables are
 * bucketed on the join key, the equi-join runs with NO shuffle exchange —
 * the physical plan reads pre-clustered buckets on both sides. This is the
 * pre-partitioning a 100 TB deployment applies to objmap/payloads
 * (bucket by chunkKey) and lineitem/orders (bucket by orderkey).
 */
class BucketedJoinSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without a shuffle") {
    // (warehouse dir is a static conf; tables land in the default
    // spark-warehouse and are dropped below)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.t(spark, sfDir, "orders")
      val l = Tables.t(spark, sfDir, "lineitem")
      o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // the join itself must be shuffle-free; the only allowed exchange is
      // the post-join groupBy's (which re-uses the bucket clustering here,
      // so there should be none at all)
      assert(exchanges.isEmpty,
        s"expected a shuffle-free bucketed join, found ${exchanges.size} exchange(s)")
      assert(joined.count() > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
