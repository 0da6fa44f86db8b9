package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join-shaped operators beyond plain equi-joins (north_star additions;
 * the reference's only non-equi lookup is the C1 interval containment,
 * generalized here to as-of and range joins — the two shapes a training-data
 * pipeline actually hits: point-in-time attribution and bucketization).
 */
object JoinQueries {
  import Tables._

  /** J1 as-of join (point-in-time): for each click, the user's most recent
    * strictly-prior view. Spark has no ASOF JOIN; the scale-correct
    * formulation is a single user-partitioned window over the unioned
    * event stream — one shuffle, no per-key loops, no range self-join.
    * Emitting the matched TIMESTAMP (not a row id) keeps the result
    * deterministic under equal-timestamp ties. Microsecond epochs on both
    * engines (Spark truncates the parquet ns timestamps to us natively).
    */
  def j1AsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    e.withColumn("prior_view_us",
        max(when(col("event_type") === "view", col("ts_us"))).over(w))
      .filter(col("event_type") === "click" && col("prior_view_us").isNotNull)
      .withColumn("gap_us", col("ts_us") - col("prior_view_us"))
      .select("event_id", "user_id", "ts_us", "prior_view_us", "gap_us")
      .orderBy("event_id")
  }

  /** J2 range (bucket) join: lineitems classified into quantity bands via a
    * tiny in-memory dimension — the broadcast-nested-loop range join that a
    * bucketization step needs. The dim is broadcast (a handful of rows);
    * the fact side never shuffles until the final rollup.
    */
  def j2RangeBucket(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val buckets = Seq(
      (0.0, 10.0, "small"), (10.0, 25.0, "mid"),
      (25.0, 40.0, "large"), (40.0, 1e9, "huge"))
      .toDF("lo", "hi", "bucket")
    val l = t(spark, dir, "lineitem")
    l.join(broadcast(buckets),
        l("l_quantity") >= col("lo") && l("l_quantity") < col("hi"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy("bucket")
  }
}
