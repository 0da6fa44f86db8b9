package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Exact global prefix offsets WITHOUT an unpartitioned window — the
 * scale-safe replacement for `Window.orderBy(...)` over a whole corpus
 * (the single-task global sort the round-6 verdict flagged on y9, now the
 * shared scaffold behind y9 / z3 / m5):
 *
 *  1. range-partition the rows by the global ordering columns,
 *  2. one O(nParts) job collects the per-partition weight sums,
 *  3. the exclusive prefix sums broadcast back (nParts rows), and
 *  4. each partition's LOCAL window cumsum + its partition offset is the
 *     exact global running total.
 *
 * Driver memory is O(nParts) regardless of corpus size, every partition
 * ranks in parallel, and the result is deterministic for a total ordering
 * (give `order` a tie-breaker column). `localCheckpoint` pins the sampled
 * range boundaries: the sums job and the consumer job MUST see the same
 * row→partition assignment, or the offsets describe a different layout
 * than the one they are joined back onto.
 */
object ExactOffsets {

  /** Returns (`df` with two extra columns, total weight): `pid` (the pinned
    * range-partition id) and `offsetCol` = the exclusive global prefix sum
    * of `weight` in `order`-order (i.e. the total weight of all rows
    * strictly before this row's partition). Combine with a per-partition
    * window cumsum over the same `order` for the exact global running
    * total. */
  def withPartitionOffsets(spark: SparkSession, df: DataFrame, order: Seq[Column],
      weight: Column, offsetCol: String): (DataFrame, Long) = {
    import spark.implicits._
    val nParts = spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(nParts, order: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    val sums = parted.groupBy("pid").agg(sum(weight).as("s"))
      .as[(Int, Long)].collect().sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = acc; acc += s; (pid, o) }
    val offsetsDf = offsets.toSeq.toDF("pid", offsetCol) // nParts rows -> broadcast
    (parted.join(broadcast(offsetsDf), "pid"), acc)
  }
}
