package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation utilities for shuffle joins/aggregations whose key
 * distribution has heavy hitters (the situation AQE's skew-join split
 * handles for sort-merge joins; these helpers cover the cases it doesn't:
 * pre-planned salting when the skew is known, and two-phase aggregation).
 *
 * The reference engine is single-node and has no notion of partition skew;
 * at 100 TB a handful of hot keys (one viral document hash, one null-ish
 * join key) can pin a whole stage on one task — salting restores parallelism
 * at the cost of replicating the small side `numSalts` times.
 */
object SkewOps {

  private val SaltCol = "__graft_salt"

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted into
    * `numSalts` sub-keys and the dim side replicated across all salts.
    * Result equals the plain inner join; hot fact keys now spread over
    * `numSalts` reducers. Use when `dim` is too big to broadcast but small
    * enough to replicate `numSalts`x. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String, numSalts: Int): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    val fs = fact.withColumn(SaltCol, (rand(42) * numSalts).cast("int"))
    val ds = dim.withColumn(SaltCol, explode(sequence(lit(0), lit(numSalts - 1))))
    fs.join(ds, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase (salted) aggregation: partial count/sum per (key, salt), then
    * final combine per key. Spark's hash aggregate already does map-side
    * partials; the explicit salted phase additionally splits a hot key's
    * REDUCE work across `numSalts` tasks, which matters when one key's
    * partials alone overflow a single reducer. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, numSalts: Int): DataFrame = {
    require(numSalts > 1, "numSalts must be > 1")
    df.withColumn(SaltCol, (rand(42) * numSalts).cast("int"))
      .groupBy(col(key), col(SaltCol))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol).cast("decimal(28,6)")).as("__s"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__s").cast("double").as("sum_value"))
  }

  /** Driver query k1: the salted path end-to-end over a DELIBERATELY skewed
    * key. Every fourth events user collapses onto user 1 (a synthesized
    * heavy hitter holding ~1/4 of the fact table — the viral-document shape),
    * the customer dim joins through [[saltedEquiJoin]] (hot key spread over
    * 8 reducers, dim replicated 8x), and the per-segment rollup runs through
    * [[saltedCountSum]] (5 segments — exactly the low-cardinality reduce a
    * single hot reducer would otherwise serialize). Salting is
    * output-invariant, so a plain join+group-by SQL oracle checks it:
    * decimal-accumulated sums keep the result partition-order-independent. */
  def k1SaltedJoin(spark: SparkSession, dir: String): DataFrame = {
    import Tables.t
    val fact = t(spark, dir, "events")
      .select(
        when(col("user_id") % 4 === 0, lit(1L)).otherwise(col("user_id")).as("c_custkey"),
        col("value"))
    val dim = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    saltedCountSum(saltedEquiJoin(fact, dim, "c_custkey", 8), "c_mktsegment", "value", 8)
      .orderBy("c_mktsegment")
  }

  /** Child session tuned so AQE's runtime skew-join split DEMONSTRABLY
    * fires at test scale: broadcast is disabled (the dim would otherwise
    * broadcast and there'd be no shuffle to skew), and the skew thresholds
    * are lowered from their 256 MB-class production defaults to replay
    * scale — at 100 TB you keep the defaults and AQE does exactly the same
    * split on real hot partitions. Session-scoped conf only; the parent
    * session is untouched. */
  def aqeSkewSession(rootSpark: SparkSession): SparkSession = {
    val s = rootSpark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    // also defeats partition coalescing folding the skew back together
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s
  }

  /** The unsalted join k2 routes through AQE: plain sort-merge join on the
    * (skewed) key, then a rollup exposing the hot key's share per segment.
    * Factored out so the spec can run the same shape on synthetic data and
    * assert the executed plan actually split the hot partition. */
  def aqeSkewRollup(fact: DataFrame, dim: DataFrame): DataFrame =
    fact.join(dim, "c_custkey")
      .groupBy(col("c_mktsegment"), (col("c_custkey") === 1L).as("is_hot"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
      .orderBy("c_mktsegment", "is_hot")

  /** Driver query k2: the SAME skewed join as k1 but UNSALTED — mitigation
    * delegated to AQE's runtime skew-join split (OptimizeSkewedJoin): the
    * hot fact partition (~1/4 of the table on one key) is split into
    * advisory-sized sub-partitions at runtime, the matching dim rows are
    * replicated per sub-split, and no manual salting or key knowledge is
    * needed. This is the preferred mitigation when the skew is NOT known in
    * advance (k1's salting is for when it is, or for the aggregation side
    * AQE doesn't cover). Output is split-invariant, so a plain join SQL
    * oracle checks it; AqeSkewSpec asserts the split actually fired. */
  def k2AqeSkewJoin(rootSpark: SparkSession, dir: String): DataFrame = {
    import Tables.t
    val spark = aqeSkewSession(rootSpark)
    val fact = t(spark, dir, "events")
      .select(
        when(col("user_id") % 4 === 0, lit(1L)).otherwise(col("user_id")).as("c_custkey"),
        col("value"))
    val dim = t(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    aqeSkewRollup(fact, dim)
  }
}
