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

  /** J3 interval-overlap join: which user pairs had concurrently-active
    * sessions, and for how long — the third non-equi join shape (j1 is
    * point-in-time, j2 point-in-band; this is interval×interval). Sessions
    * derive from the same 30-min-gap rule as t2, in integer microseconds
    * throughout, so every overlap duration is exact.
    *
    * Scale design: Spark plans a raw overlap predicate as a broadcast
    * nested loop — |sessions|² compares at corpus scale. Instead each
    * session EXPLODES onto the 1-hour grid cells it spans and candidates
    * come from a cell equi-join (shuffle-partitionable, like the LSH band
    * joins): candidate volume is sum(per-cell density²), tuned by the cell
    * width, never |corpus|². The grid is a complete-by-construction
    * prefilter (two intervals overlap only if they share a cell), and each
    * overlapping pair is COUNTED exactly once without a dedupe shuffle:
    * both sessions span the cell where the overlap starts
    * (greatest(st_a, st_b) div cell), so keeping a candidate only in that
    * canonical cell is a narrow filter that replaces the 4-key
    * dropDuplicates a naive multi-cell join needs. Output equals the
    * quadratic oracle's exactly. */
  def j3IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    // 10-min cells: candidate volume is sum(density²) and this corpus's
    // sessions are near-point-like (96.6k cell rows for 95.5k sessions at
    // 1-h cells), so narrower cells cut candidates ~5× (13.1M → 2.5M
    // measured) for a 6% explode growth. The canonical-cell filter keeps
    // the answer width-independent.
    val cellUs = 600L * 1000000L
    val gapUs = 1800L * 1000000L
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    // event_id tiebreak: equal-timestamp events would otherwise make lag()
    // nondeterministic (j1/t2's rule)
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val sess = e
      .withColumn("gap", col("us") - coalesce(lag("us", 1).over(w), col("us")))
      .withColumn("sid", sum(when(col("gap") > gapUs, 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("us").as("st"), max("us").as("en"))
      // two explode consumers below — materialize the sessionization once
      .localCheckpoint()
    val cells = sess.withColumn("cell",
      explode(sequence(expr(s"st div $cellUs"), expr(s"en div $cellUs"))))
    // sid doesn't ride through the join: the canonical cell already keys
    // each pair uniquely, so the shuffle carries 4 longs per side
    val a = cells.select(col("cell"), col("user_id").as("ua"),
      col("st").as("sta"), col("en").as("ena"))
    val b = cells.select(col("cell"), col("user_id").as("ub"),
      col("st").as("stb"), col("en").as("enb"))
    a.join(b, Seq("cell"))
      .filter(col("ua") < col("ub"))
      .filter(col("sta") <= col("enb") && col("stb") <= col("ena"))
      .filter(col("cell") === expr(s"greatest(sta, stb) div $cellUs"))
      .groupBy(col("ua"), col("ub"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(least(col("ena"), col("enb")) - greatest(col("sta"), col("stb")))
          .as("total_overlap_us"))
      .orderBy("ua", "ub")
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

  /** J4 interval ANTI-join: views with NO click by the same user inside
    * the 3-day conversion window — w6's funnel drop-offs as a first-class
    * join shape (j1 point-in-time, j2 point-in-band, j3 interval×interval,
    * j4 the negated form). Spark plans the left_anti with an equi user_id
    * key plus the range residual, so both sides shuffle ONCE on user_id —
    * no nested loop; the weekly rollup then reduces map-side. A whale user
    * is k1's salting story. */
  def j4IntervalAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val winUs = 3L * 86400L * 1000000L
    val weekUs = 604800L * 1000000L
    val ev = t(spark, dir, "events")
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    val unconverted = v.join(c,
      col("user_id") === col("c_user") &&
        col("c_us") > col("us") && col("c_us") <= col("us") + lit(winUs),
      "left_anti")
    val tot = v.groupBy(expr(s"us div $weekUs").as("wk"))
      .agg(count(lit(1)).as("n_views"))
    val unc = unconverted.groupBy(expr(s"us div $weekUs").as("wk"))
      .agg(count(lit(1)).as("n_unconverted"))
    tot.join(unc, Seq("wk"), "left")
      .select(col("wk"), col("n_views"),
        coalesce(col("n_unconverted"), lit(0L)).as("n_unconverted"))
      .orderBy("wk")
  }

  /** j5: NEAREST-event join — the bidirectional as-of: for every purchase,
    * the user's nearest click by |Δt| in EITHER direction within ±1 day
    * (j1's as-of only looks backward; sensor/feature alignment usually
    * wants nearest). The pick is one lexicographic min(struct(|Δ|, id, Δ))
    * per purchase — ties on equidistant before/after clicks break on
    * click_id, so the answer is total-ordered with no window. Scale: equi
    * join on user_id with the horizon as the join residual — fan-out
    * bounded by a user's ±1-day click density; one exchange per side on
    * the same key; the rollup exchanges one row per purchase. */
  def j5NearestJoin(spark: SparkSession, dir: String): DataFrame = {
    val horizonUs = 86400L * 1000000L
    val e = t(spark, dir, "events")
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), unix_micros(col("ts")).as("pus"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("cus"))
    p.join(c, col("pu") === col("cu") &&
        abs(col("cus") - col("pus")) <= horizonUs)
      .groupBy("event_id")
      .agg(first(col("pu")).as("user_id"),
        min(struct(abs(col("cus") - col("pus")).as("adus"),
          col("click_id").as("cid"),
          (col("cus") - col("pus")).as("dus"))).as("m"))
      .select(col("event_id"), col("user_id"),
        col("m.cid").as("nearest_click_id"), col("m.dus").as("delta_us"))
      .orderBy("event_id")
  }

  /** j6: point-in-time SCD2 dimension lookup — the consumer side of r6's
    * temporal build (and st12's streamed maintenance): each PURCHASE
    * fact joins to the dimension row that was current at its timestamp.
    * The dimension is the user's browsing-mode history — r6's run
    * derivation over the click/view stream only — so the join is a real
    * cross-family as-of lookup, not the circular self-join (joining
    * events to runs built FROM them is diagonal by construction: every
    * event's as-of state is its own type). Containment is half-open
    * (`valid_from ≤ ts < valid_to`, open row unbounded): a user's runs
    * tile [first touch, ∞), so a purchase matches at most one row;
    * purchases before any touch fall out of the LEFT join as mode
    * 'none'. Emits purchases and decimal-exact revenue per then-current
    * mode — the "does browsing mode convert" table. Scale: equi-join on
    * user_id with the range residual as join filter (j1's shape); the
    * dimension side is change-points only (≪ facts); the rollup is
    * |modes|+1 rows after a map-side partial. */
  def j6Scd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val w = Window.partitionBy("du").orderBy("us", "event_id")
    val dim = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id").as("du"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("us", 1).over(w))
      .select(col("du"), col("event_type").as("mode"),
        col("us").as("valid_from"), col("valid_to"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pus"), col("value"))
    p.join(dim, col("user_id") === col("du") &&
        col("pus") >= col("valid_from") &&
        (col("valid_to").isNull || col("pus") < col("valid_to")), "left")
      .groupBy(coalesce(col("mode"), lit("none")).as("mode"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("revenue"))
      .orderBy("mode")
  }
}
