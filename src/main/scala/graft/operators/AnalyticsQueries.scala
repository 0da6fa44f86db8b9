package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Generic analytics surface (BASELINE.json north_star: joins, windows,
 * aggregations as first-class queries). All Catalyst built-ins; dimension
 * joins are explicitly broadcast so the 100 TB plan is shuffle-free on the
 * dim side.
 */
object AnalyticsQueries {
  import Tables._

  /** TPC-H Q1-shaped scan+agg: the pricing summary report. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped join + top-k: revenue of BUILDING-segment orders.
    * Orders meet the BUILDING-customer broadcast BEFORE the orderkey
    * shuffle, so the fact-fact exchange carries only the ~1/5 of orders
    * with BUILDING customers rather than every order — the broadcast is a
    * semi-join-style reducer here, same shape as q8's region filter. */
  def q3TopRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = t(spark, dir, "orders").join(broadcast(c), col("o_custkey") === c("c_custkey"))
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_orderkey"), o("o_orderdate").cast("date").as("o_orderdate"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-shaped semi-join aggregate: orders with at least one item
    * shipped after the order date, counted by priority. The EXISTS becomes
    * a left-semi join with the correlated date predicate in the join
    * condition — one shuffle on orderkey, no fact duplication. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
        l("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q10-shaped: top 20 customers by revenue on returned items.
    * Fact-fact join shuffles once on orderkey; the customer dim joins the
    * POST-aggregation per-customer rows broadcast-side, so the dim join
    * touches |customers-with-returns| rows, not the fact table. */
  def q10ReturnedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(o("o_custkey"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q5-shaped multi-join: revenue by nation within one region.
    * Dims (region→nation→customer/supplier) broadcast; facts shuffle once. */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(spark, dir, "nation")
    val c = t(spark, dir, "customer")
    val s = t(spark, dir, "supplier")
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    val dims = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s),
        l("l_suppkey") === s("s_suppkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(dims), s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q18-shaped large-volume orders: orders whose total quantity
    * exceeds 250 (top ~1%), joined back to their customer. The HAVING
    * filter runs on the pre-aggregated per-order rollup, so the order and
    * customer joins touch only qualifying keys — never a fact re-scan. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val big = l.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("double").as("total_qty"))
      .filter(col("total_qty") > 250)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  /** TPC-H Q11-shaped global-share HAVING: parts whose revenue exceeds
    * 1.4x the mean per-part revenue. The shape: a grouped aggregate
    * filtered against a scalar derived from the SAME aggregate — the
    * 1-row global (total, count) broadcasts back over the per-part rows,
    * so the fact scans once and the threshold join moves one row. The
    * threshold is total/n (sums decimal-exact), NOT avg(double), which
    * would be partition-order-dependent; both engines evaluate
    * double-total / count then *1.4 in the same order, so the filter is
    * bitwise-reproducible. */
  def q11RevenueShare(spark: SparkSession, dir: String): DataFrame = {
    val perPart = t(spark, dir, "lineitem")
      .groupBy(col("l_partkey"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("part_revenue"))
    val global = perPart.agg(
      sum(col("part_revenue").cast("decimal(28,6)")).cast("double").as("total_rev"),
      count(lit(1)).as("n_parts"))
    perPart.join(broadcast(global))
      .withColumn("mean_rev", col("total_rev") / col("n_parts"))
      .filter(col("part_revenue") > lit(1.4) * col("mean_rev"))
      .select(col("l_partkey"), col("part_revenue"),
        round(col("part_revenue") / col("mean_rev"), 4).as("ratio_to_mean"))
      .orderBy("l_partkey")
  }

  /** TPC-H Q21-shaped sole-late-supplier: suppliers that were the ONLY
    * late supplier (shipped >60 days after the order date) on a
    * multi-supplier order — the classic EXISTS + NOT EXISTS pair,
    * decorrelated into a left-SEMI join (some other supplier shared the
    * order) and a left-ANTI self-join (no other supplier was late on it).
    * Both run on the deduplicated (orderkey, suppkey) edge set, never the
    * raw fact; at scale all three joins shuffle on orderkey — one
    * partitioning reused across the semi, anti, and count stages. The
    * semi and anti probe sides carry SHUFFLE_HASH hints (r18, guide §3.1):
    * the planner's default is a sort-merge join, which pays two
    * edge-set sorts per join for set-membership semantics that a
    * per-partition hash build answers directly; the build sides (the
    * multi-supplier order list, the late edge set) are post-shuffle
    * partition-bounded, the same memory shape AQE's own SMJ→SHJ rewrite
    * targets. Row-for-row identical output — join strategy, not join
    * semantics (oracle-gated). */
  def q21WaitingSupplier(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val s = t(spark, dir, "supplier")
    val edges = l.select(col("l_orderkey"), col("l_suppkey")).distinct()
    // materialized: `late` anchors BOTH the probe side and the anti side —
    // un-checkpointed, the lineitem⋈orders late-scan executes twice (plan
    // audit showed the duplicated subtree; exchange reuse is not guaranteed
    // across the anti join's two arms)
    val late = l.join(o, l("l_orderkey") === o("o_orderkey") &&
        l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .localCheckpoint()
    val multi = edges.groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_supp")).filter(col("n_supp") > 1)
      .select("l_orderkey")
    late.as("t")
      .join(multi.hint("SHUFFLE_HASH"), Seq("l_orderkey"), "left_semi")
      .join(late.as("x").hint("SHUFFLE_HASH"),
        col("t.l_orderkey") === col("x.l_orderkey") &&
          col("t.l_suppkey") =!= col("x.l_suppkey"), "left_anti")
      .join(broadcast(s), col("t.l_suppkey") === s("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  /** TPC-H Q13-shaped customer order distribution: how many customers
    * placed exactly k orders, including k = 0 (the classic outer-join
    * aggregation). Orders pre-aggregate to one count per custkey BEFORE
    * the customer join (map-side combine collapses the fact side to
    * |customers| rows), so the join never sees raw order rows; customers
    * with no orders survive via the left join and count as 0. */
  def q13OrderDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_custkey"))
    val perCust = t(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    c.join(perCust, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q22-shaped dormant high-balance customers: per nation, the
    * customers whose balance beats the global positive-balance average yet
    * placed no order since 2000 (every customer in this corpus has SOME
    * order, so dormancy is recency-based). Composes the two remaining
    * classic shapes: a scalar subquery (the global average computes once
    * and broadcasts into the filter as a literal-like 1-row cross join)
    * and a LEFT-ANTI join (customer minus recent orders on custkey — no
    * row ever duplicates, unlike a NOT IN rewrite). The date filter is
    * pushed to the orders scan, so the anti join's build side holds only
    * recent custkeys. */
  def q22DormantBalance(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    // exact decimal accumulate, ONE cast to double, then IEEE division —
    // the same evaluation order as the oracle's CAST(sum AS DOUBLE)/count
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_bal"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").as("nationkey"))
      .agg(count(lit(1)).as("n_custs"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("total_bal"))
      .orderBy("nationkey")
  }

  /** TPC-H Q15-shaped top supplier: the supplier(s) whose windowed revenue
    * EQUALS the global maximum — the argmax-by-global-aggregate shape (a
    * scalar subquery over an aggregate of an aggregate), distinct from
    * w1's per-group top-k. One lineitem scan builds per-supplier revenue;
    * the 1-row max broadcasts back over it; only winners join the supplier
    * dim. Decimal-exact revenue, so "equals the max" is well-defined. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("total_revenue"))
    val best = rev.agg(max("total_revenue").as("best"))
    rev.join(broadcast(best)).filter(col("total_revenue") === col("best"))
      .join(broadcast(t(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q17-shaped small-quantity revenue: lineitems under 20% of their
    * part's average quantity, restricted to small parts — the classic
    * correlated scalar subquery, DECORRELATED into a per-part aggregate
    * joined back to the fact (one extra lineitem aggregation instead of a
    * per-row subquery). The threshold is computed decimal-sum-then-IEEE
    * (one cast, one divide, one multiply) in the same order as the oracle,
    * so the boundary comparison is bitwise-identical. */
  def q17SmallQuantity(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val lim = l.groupBy(col("l_partkey").as("lim_partkey"))
      .agg((lit(0.2) * (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
        count(lit(1)))).as("qty_limit"))
    val smallParts = t(spark, dir, "part").filter(col("p_size") <= 5).select(col("p_partkey"))
    l.join(lim, col("l_partkey") === col("lim_partkey"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .filter(col("l_quantity") < col("qty_limit"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") / 7.0)
        .as("avg_yearly"))
  }

  /** TPC-H Q19-shaped disjunctive-predicate revenue: three OR'd
    * brand/size/quantity bundles across the part join — the shape that
    * tests predicate normalization (the common `p_partkey = l_partkey`
    * stays a join key; per-bundle residuals evaluate post-join on the
    * broadcast dim). One row out; decimal-exact revenue. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .join(broadcast(t(spark, dir, "part")), col("p_partkey") === col("l_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 20) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_size").between(25, 50) && col("l_quantity").between(20, 36)))
      .agg(count(lit(1)).as("n_items"),
        moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))

  /** TPC-H Q16-shaped supplier variety: how many DISTINCT suppliers ship
    * each small-part (brand, type, size) bucket, excluding a blocklist (the
    * negative-balance suppliers stand in for Q16's complaint filter, and
    * lineitem's (part, supp) edges stand in for partsupp, which the corpus
    * doesn't carry). The shape under test: distinct-count aggregation over
    * a fact table with BOTH a broadcast dim filter and a broadcast
    * anti-join. Distinct-count is two-phase — partial dedupe of
    * (brand, type, size, suppkey) happens map-side, so the exchange carries
    * deduped keys, not the fact stream. */
  def q16SupplierVariety(spark: SparkSession, dir: String): DataFrame = {
    val smallParts = t(spark, dir, "part").filter(col("p_size") <= 3)
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val blocked = t(spark, dir, "supplier").filter(col("s_acctbal") < 0)
      .select("s_suppkey")
    t(spark, dir, "lineitem")
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(blocked), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("l_suppkey").as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q7-shaped volume shipping: the cross-border revenue matrix —
    * revenue flowing from every supplier nation to every DIFFERENT customer
    * nation, split by ship year. Supplier and customer sides pre-join their
    * broadcast nation dims; facts shuffle once on orderkey. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val s = t(spark, dir, "supplier")
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val c = t(spark, dir, "customer")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val o = t(spark, dir, "orders")
    val l = t(spark, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation")) // cross-border only
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q14-shaped conditional aggregation: PROMO revenue share per ship
    * month — filtered numerator and full denominator from ONE pass over the
    * join (a correlated-subquery formulation would scan the facts twice).
    * Part dim broadcast; the ratio is one IEEE divide over decimal-exact
    * double sums, so the answer is partition-count independent. */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val l = t(spark, dir, "lineitem")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).cast("date").as("ship_month"))
      .agg(
        moneySumExpr(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0)))
          .as("promo_revenue"),
        moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      .withColumn("promo_pct",
        round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 4))
      .orderBy("ship_month")
  }

  /** Window ranking: top-3 parts by revenue within each brand. */
  def w1TopPerBrand(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val l = t(spark, dir, "lineitem")
    val rev = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    val w = Window.partitionBy("p_brand").orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("p_brand", "p_partkey", "revenue", "rank")
      .orderBy("p_brand", "rank")
  }

  /** Top-3 parts per brand via the bounded-heap TopKAgg instead of a window:
    * identical output to w1, but aggregation state is k rows per group with
    * map-side combine — no full sort of the fact side (the window form must
    * sort every brand's whole row set). The preferable 100 TB top-k shape. */
  def w3TopKAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = t(spark, dir, "part")
    val l = t(spark, dir, "lineitem")
    val rev = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(moneySumExpr(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
    rev.select(col("p_brand"), col("revenue"), col("p_partkey"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(new graft.functions.TopKAgg(3).toColumn.name("top"))
      .flatMap { case (brand, top) =>
        top.iterator.zipWithIndex.map { case ((revenue, pk), i) => (brand, pk, revenue, i + 1) }
      }
      .toDF("p_brand", "p_partkey", "revenue", "rank")
      .orderBy("p_brand", "rank")
  }

  /** Analytic frame: per-supplier running revenue by ship date. */
  def w2RunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val daily = l.groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"))
      .agg(moneySum(col("l_extendedprice")).as("day_revenue"))
    val w = Window.partitionBy("l_suppkey").orderBy("ship_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      // re-exact the running sum: day_revenue is an exact 2-dp double
      .withColumn("running_revenue",
        sum(col("day_revenue").cast("decimal(18,2)")).over(w).cast("double"))
      .select("l_suppkey", "ship_date", "day_revenue", "running_revenue")
      .orderBy("l_suppkey", "ship_date")
  }

  /** Trailing 7-day revenue per supplier via a RANGE frame — the
    * value-based window shape w2's ROWS frame can't express: the frame
    * covers a sliding six-days-back INTERVAL of the ordering value, so
    * gaps in the calendar shrink the window instead of reaching further
    * back. Ordered on the day ordinal (days since epoch) with
    * rangeBetween(-6, 0); the frame sum re-exacts through decimal.
    * Same single exchange+sort as any one-spec window. */
  def w4TrailingRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"))
      .agg(moneySum(col("l_extendedprice")).as("day_revenue"))
      .withColumn("day_ord", datediff(col("ship_date"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("l_suppkey").orderBy("day_ord").rangeBetween(-6, 0)
    daily
      .withColumn("trailing_7d",
        sum(col("day_revenue").cast("decimal(18,2)")).over(w).cast("double"))
      .select("l_suppkey", "ship_date", "day_revenue", "trailing_7d")
      .orderBy("l_suppkey", "ship_date")
  }

  /** TPC-H Q8-shaped market share: of all revenue flowing into one region's
    * market, what fraction is supplied by one nation, per order year — the
    * share-of-conditional-sum shape over the full 6-way join. Both sums
    * come from ONE pass (conditional aggregation, like q14); the share
    * divides the two exact doubles, so the ratio is bitwise-reproducible.
    * All dims pre-join broadcast-side; the fact shuffles once. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "nation")
    val custNation = t(spark, dir, "customer")
      .join(broadcast(n.select(col("n_nationkey"), col("n_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNation = t(spark, dir, "supplier")
      .join(broadcast(n.select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNation), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .withColumn("rev", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .groupBy(year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(
        moneySumExpr(col("rev")).as("mkt_total"),
        moneySumExpr(when(col("supp_nation") === "NATION_0", col("rev")).otherwise(lit(0)))
          .as("nation_rev"))
      .withColumn("mkt_share", round(col("nation_rev") / col("mkt_total"), 6))
      .orderBy("o_year")
  }

  /** Grouping sets: rollup over returnflag/linestatus. */
  def r1Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Sketch aggregation: HyperLogLog++ approximate distinct counts next to
    * the exact answer — the O(1)-state cardinality path a 100 TB profiler
    * uses where exact countDistinct would shuffle every distinct value.
    * Spark-only (HLL estimates are engine-specific); the smoke spec bounds
    * the relative error. */
  def q6ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("approx_orders"))
      .orderBy("l_returnflag")

  /** EXPLICIT grouping sets (the general form r1's rollup and r2's cube
    * are shorthands for): the full pair, the linestatus-only slice, and
    * the grand total — a set no rollup/cube over these two columns
    * produces. `grouping(col)` flags disambiguate real NULLs from
    * aggregated-away dimensions, emitted as separate 0/1 columns (portable;
    * combined grouping_id bit orders are engine-specific). Plans as ONE
    * Expand + aggregate pass, not three unioned scans. */
  def r3GroupingSets(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_stat"),
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))
      .orderBy(col("g_flag"), col("g_stat"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Grouping sets: full cube over returnflag/linestatus (r1 is the rollup
    * form; cube adds the linestatus-only slices). */
  def r2Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), moneySum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact percentiles per group (linear interpolation — Spark `percentile`
    * and DuckDB `quantile_cont` share the definition; rounded to absorb
    * last-ulp interpolation differences). */
  def p1Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_quantity, 0.25)"), 4).as("q25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("q50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("q75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("price_median"))
      .orderBy("l_returnflag")

  /** Sketch percentiles next to the exact answer — the O(1)-state profiler
    * path (q6 is the cardinality face of the same trade): Spark's
    * `approx_percentile` (KLL-family quantile sketch, bounded state + exact
    * merge) against the exact `percentile`. At 100 TB the exact form must
    * shuffle-collect every group's values; the sketch aggregates in fixed
    * memory with map-side partial merges. Spark-only: DuckDB's
    * approx_quantile is a different sketch (t-digest), so the spec pins the
    * accuracy envelope instead of an oracle. The sketch result is projected
    * to scalar columns (the external check hashes column values, so every
    * output column must be scalar). */
  def p2ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)").as("approx_q"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("exact_q50"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx_price_median"))
      .select(
        col("l_returnflag"),
        element_at(col("approx_q"), 1).as("approx_q25"),
        element_at(col("approx_q"), 2).as("approx_q50"),
        element_at(col("approx_q"), 3).as("approx_q75"),
        col("exact_q50"), col("approx_price_median"))
      .orderBy("l_returnflag")

  /** q6's AUDIT TWIN (r12): the HLL++ sketch and the exact distinct count
    * computed in ONE aggregation pass, with the sketch's published error
    * contract (|approx − exact| / exact ≤ 3·rsd = 0.06 at rsd = 0.02)
    * emitted AS DATA — per-group 0/1 verdict columns the DuckDB oracle
    * re-derives trivially (exact counts + literal 1). This turns the
    * previously driver-invisible bounded-pass contract (it lived only in
    * tools/check_oracle.py, so the driver artifact recorded `no_oracle`
    * forever) into an ordinary hash-MATCH row: if the sketch ever drifts
    * past its bound, the verdict flips to 0 and the hash breaks. The
    * approx values themselves stay OUT of the output (engine-specific
    * estimates have no cross-engine bridge — DuckDB's HLL is its own).
    * Scale: identical plan to q6 — one map-side-combinable agg where the
    * HLL state is O(1) per group; the exact countDistinct rides along as
    * the audit lane a 100 TB run drops (q6's scaladoc trade, unchanged). */
  def q6bDistinctAudit(spark: SparkSession, dir: String): DataFrame = {
    val rel = (a: Column, e: Column) =>
      abs(a.cast("double") - e.cast("double")) / e.cast("double")
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.02).as("ao"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
      .select(
        col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (rel(col("ap"), col("exact_parts")) <= 0.06).cast("long").as("parts_within_bound"),
        (rel(col("ao"), col("exact_orders")) <= 0.06).cast("long").as("orders_within_bound"))
      .orderBy("l_returnflag")
  }

  /** p2's AUDIT TWIN (r12), the quantile face of q6b: the KLL-family
    * sketch (approx_percentile, accuracy = 1000) checked against its rank
    * envelope IN-QUERY and emitted as a 0/1 verdict column. The contract
    * (same arithmetic as tools/check_oracle.py's bounded check): each
    * returned quantile is a real data value whose integer rank interval
    * [count(< v), count(≤ v)] must intersect q·n ± (n/accuracy + 1) — the
    * +1 row absorbs the sketch's 1-based rank convention and integer
    * rounding, sub-row conventions rather than sketch error. Exact
    * quantiles (percentile ≡ DuckDB quantile_cont, rounded) ride along as
    * the oracle-matched columns. Two passes over the group: the agg that
    * builds sketch + exact, then ONE conditional-count pass against the
    * 3-row agg broadcast back to lineitem for the rank intervals — at
    * 100 TB both are map-side-combinable scans; the exact `percentile`
    * lane is the audit a production run drops, leaving sketch + rank
    * probe (the probe only counts comparisons against 4 broadcast
    * scalars per group, no extra shuffle of values). */
  def p2bPercentileAudit(spark: SparkSession, dir: String): DataFrame = {
    val eps = 1.0 / 1000
    val l = t(spark, dir, "lineitem")
    val agg = l.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)").as("aq"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("apm"),
        count(lit(1)).as("n"),
        round(expr("percentile(l_quantity, 0.25)"), 4).as("exact_q25"),
        round(expr("percentile(l_quantity, 0.5)"), 4).as("exact_q50"),
        round(expr("percentile(l_quantity, 0.75)"), 4).as("exact_q75"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("exact_price_median"))
      .select(col("l_returnflag").as("g"), col("aq"), col("apm"), col("n"),
        col("exact_q25"), col("exact_q50"), col("exact_q75"),
        col("exact_price_median"))
    // rank intervals for the 4 sketch values in one conditional-count pass
    val probe = l.join(broadcast(agg), col("l_returnflag") === col("g"))
    def lohi(v: Column, x: Column, tag: String) = Seq(
      count(when(x < v, 1)).as(s"lo_$tag"), count(when(x <= v, 1)).as(s"hi_$tag"))
    val ranks = probe.groupBy("l_returnflag")
      .agg(first(col("n")).as("n2"),
        (lohi(element_at(col("aq"), 1), col("l_quantity"), "q25") ++
         lohi(element_at(col("aq"), 2), col("l_quantity"), "q50") ++
         lohi(element_at(col("aq"), 3), col("l_quantity"), "q75") ++
         lohi(col("apm"), col("l_extendedprice"), "pm")): _*)
    def ok(tag: String, q: Double) = {
      val target = lit(q) * col("n2").cast("double")
      val bound = lit(eps) * col("n2").cast("double") + lit(1.0)
      (col(s"lo_$tag").cast("double") <= target + bound) &&
        (col(s"hi_$tag").cast("double") >= target - bound)
    }
    agg.join(ranks, col("g") === ranks("l_returnflag"))
      .select(col("g").as("l_returnflag"), col("n"),
        col("exact_q25"), col("exact_q50"), col("exact_q75"),
        col("exact_price_median"),
        (ok("q25", 0.25) && ok("q50", 0.5) && ok("q75", 0.75) &&
          ok("pm", 0.5)).cast("long").as("within_envelope"))
      .orderBy("l_returnflag")
  }

  /** Moment statistics (mean/variance/correlation) from EXACT decimal sums:
    * raw-double `avg`/`var_pop`/`corr` are partition-order-dependent, so
    * instead each moment is a decimal sum (exact, order-independent) cast
    * once to double, and the formula is evaluated on those scalars — the
    * result is bitwise-reproducible across partitionings AND engines. */
  def s2ExactStats(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    val dq = col("l_quantity").cast("decimal(18,2)")
    val dp = col("l_extendedprice").cast("decimal(18,2)")
    l.groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(dq).cast("double").as("sq"),
        sum((col("l_quantity") * col("l_quantity")).cast("decimal(38,4)")).cast("double").as("sqq"),
        sum(dp).cast("double").as("sp"),
        sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(38,4)")).cast("double").as("spp"),
        sum((col("l_quantity") * col("l_extendedprice")).cast("decimal(38,4)")).cast("double").as("sqp"))
      .select(
        col("l_returnflag"), col("n"),
        round(col("sq") / col("n"), 6).as("mean_qty"),
        round((col("sqq") - col("sq") * col("sq") / col("n")) / col("n"), 6).as("var_qty"),
        round((col("n") * col("sqp") - col("sq") * col("sp")) /
          sqrt((col("n") * col("sqq") - col("sq") * col("sq")) *
            (col("n") * col("spp") - col("sp") * col("sp"))), 6).as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Set operations: UNION / EXCEPT over customer key sets. */
  def s1SetOps(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val building = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val rich = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    val negative = c.filter(col("c_acctbal") < 0).select("c_custkey")
    building.union(rich).distinct()
      .exceptAll(negative)
      .orderBy("c_custkey")
  }

  /** BAG set operations (s1 covers the set forms): INTERSECT ALL keeps
    * min-multiplicity matches, EXCEPT ALL removes one occurrence per
    * match — the SQL bag algebra Spark plans as aggregate+generate
    * (replicate counts) rather than joins, with no distinct collapse.
    * Urgent-priority order placements ∩ big-ticket placements, minus one
    * per negative-balance customer. */
  def s3BagSetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val big = o.filter(col("o_totalprice") > 150000).select("o_custkey")
    val negative = t(spark, dir, "customer").filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("o_custkey"))
    urgent.intersectAll(big)
      .exceptAll(negative)
      .orderBy("o_custkey")
  }

  /** Analytic-function suite over the daily supplier revenue series: lag /
    * lead neighbors, first_value anchor, percent_rank position — the
    * navigation functions w1/w2/w4 don't cover, all sharing ONE window
    * sort (same partitioning + ordering ⇒ Catalyst plans a single
    * Exchange + Sort + Window). Deterministic: (l_suppkey, ship_date) is
    * unique after the daily rollup; percent_rank divides exact small
    * integers, bitwise-identical in both engines. */
  def w5WindowSuite(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"), col("l_shipdate").cast("date").as("ship_date"))
      .agg(moneySum(col("l_extendedprice")).as("day_revenue"))
    val w = Window.partitionBy("l_suppkey").orderBy("ship_date")
    daily.select(
        col("l_suppkey"), col("ship_date"), col("day_revenue"),
        lag("day_revenue", 1).over(w).as("prev_rev"),
        lead("day_revenue", 1).over(w).as("next_rev"),
        first("day_revenue").over(w).as("first_rev"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy("l_suppkey", "ship_date")
  }

  /** W6 ordered-funnel attribution — the product-analytics staple the
    * navigation suite (w5) can't express: how many users progressed
    * view -> click -> purchase IN THAT ORDER, and with what latency. A
    * click counts only if it lands within the conversion window of the
    * user's first view; a purchase only within the window of the first
    * QUALIFIED click — so the stages compose as two stacked running-min
    * windows (first view so far, then first qualified click so far) over
    * the same (us, event_id) ROWS frame, strictly prior, fully
    * deterministic under microsecond ties (a null prior stage makes the
    * window predicate null, i.e. unqualified — no separate guard needed).
    * The 3-day window is probed to differentiate: at sf0.01 the corpus
    * funnels 150 viewed -> 115 clicked -> 81 purchased (7d saturates, 1d
    * starves). Scale: all three window
    * expressions share ONE user_id exchange + sort; the per-user funnel
    * rollup reuses that partitioning (no second exchange) and the global
    * roll-up reduces |users| rows to one via partial aggregation. No join,
    * no collect_list — state per row is two longs, whatever the per-user
    * event volume. */
  def w6Funnel(spark: SparkSession, dir: String): DataFrame = {
    val windowUs = 3L * 86400L * 1000000L
    val e = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val qualified = e
      .withColumn("fv_prior",
        min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("qc_us",
        when(col("event_type") === "click" &&
          col("us") - col("fv_prior") <= windowUs, col("us")))
      .withColumn("fc_prior", min(col("qc_us")).over(w))
      .withColumn("qp_us",
        when(col("event_type") === "purchase" &&
          col("us") - col("fc_prior") <= windowUs, col("us")))
    val perUser = qualified.groupBy("user_id").agg(
      min(when(col("event_type") === "view", col("us"))).as("fv"),
      min(col("qc_us")).as("fc"),
      min(col("qp_us")).as("fp"))
    // integer sums are exact, so the double division is bitwise-stable
    perUser.agg(
      count(lit(1)).as("users_total"),
      count(col("fv")).as("users_viewed"),
      count(col("fc")).as("users_clicked"),
      count(col("fp")).as("users_purchased"),
      round(sum(col("fc") - col("fv")).cast("double") / count(col("fc")), 4)
        .as("avg_view_to_click_us"),
      round(sum(col("fp") - col("fc")).cast("double") / count(col("fp")), 4)
        .as("avg_click_to_purchase_us"))
  }

  /** Tumbling-window event aggregation (batch shape of the streaming op):
    * hourly counts + value sums per event type. */
  def t1EventsHourly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  /** TPC-H Q2-shaped min-cost supplier (adapted: the corpus has no
    * partsupp, so the supply relation is lineitem's distinct
    * (partkey, suppkey) edge set and "cost" is the supplier's account
    * balance): for every size-15 part, the EUROPE supplier(s) with the
    * MINIMUM balance among its suppliers — the classic correlated-min
    * subquery, decorrelated into a per-part min aggregate joined back to
    * the candidate set. At scale: the edge dedup and the min-agg share one
    * partkey shuffle; part and the EUROPE supplier dim both broadcast; the
    * min table joins back partkey-partitioned (no second fact scan). */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val eur = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(spark, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val p = t(spark, dir, "part").filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_name"))
    val cand = edges
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(eur), col("l_suppkey") === col("s_suppkey"))
    val minBal = cand.groupBy(col("p_partkey").as("mk"))
      .agg(min(col("s_acctbal")).as("min_bal"))
    // min over stored doubles involves no arithmetic, so the equality
    // join-back is exact in both engines
    cand.join(minBal, col("p_partkey") === col("mk") && col("s_acctbal") === col("min_bal"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("n_name"), col("s_acctbal").as("supplier_bal"))
      .orderBy(col("supplier_bal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q9-shaped product-type profit (adapted: p_retailprice stands in
    * for ps_supplycost at a 10% carrying rate): per supplier nation and
    * order year, the profit on 'gear' parts. One fact-fact shuffle on
    * orderkey; the filtered part dim and the supplier→nation pre-join both
    * broadcast. Profit accumulates decimal-exact with ONE double expression
    * evaluated in the same operand order as the oracle. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part").filter(col("p_name").contains("gear"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sn = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nation"), year(col("o_orderdate")).cast("int").as("o_year"))
      .agg(moneySumExpr(
        col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * lit(0.1) * col("l_quantity")).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q12-shaped shipping-delay priority split (adapted: the corpus
    * has no l_shipmode/l_receiptdate, so the category axis is the
    * ship-delay bucket): per delay bucket, how many lineitems belong to
    * critical-priority orders vs not — the conditional-count join shape.
    * One orderkey shuffle; the CASE sums fold map-side. */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val crit = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("delay_days",
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
      .withColumn("delay_bucket",
        when(col("delay_days") <= 30, "a_0_30")
          .when(col("delay_days") <= 60, "b_31_60")
          .when(col("delay_days") <= 90, "c_61_90")
          .otherwise("d_over_90"))
      .groupBy("delay_bucket")
      .agg(
        sum(when(crit, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(crit, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("delay_bucket")
  }

  /** TPC-H Q20-shaped dominant supplier (adapted: with no partsupp
    * availability, "excess stock" becomes supply dominance): suppliers who
    * shipped MORE THAN HALF of some part's total 1996 quantity — the
    * nested-aggregate semi-join shape (per-(part,supp) rollup compared
    * against a per-part threshold derived from a second aggregate of the
    * same rollup). Both aggregates and the threshold join share ONE
    * partkey partitioning; the supplier→nation dim joins broadcast-side
    * onto the surviving supplier set only. Quantities accumulate
    * decimal-exact; the 0.5 multiplier is a power of two, so the dominance
    * comparison is bitwise-deterministic. */
  def q20ExcessSupply(spark: SparkSession, dir: String): DataFrame = {
    val yr = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    val perPS = yr.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("supp_qty"))
    val perP = yr.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
    val sn = t(spark, dir, "supplier")
      .join(broadcast(t(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    perPS.join(perP, col("l_partkey") === col("pk"))
      .filter(col("supp_qty") > lit(0.5) * col("total_qty"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant_parts"))
      .join(broadcast(sn), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("n_dominant_parts"))
      .orderBy(col("s_suppkey"))
  }

  /** Sessionization via gap detection (the reference has no streaming—
    * greenfield per SURVEY §7): a >30-minute silence starts a new session. */
  def t2Sessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .withColumn("ts_s", unix_timestamp(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    e.withColumn("prev", lag("ts_s", 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull || col("ts_s") - col("prev") > 1800, 1).otherwise(0))
      .withColumn("session_id", sum("new_session").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"), min("ts_s").as("session_start"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("session_value"))
      .orderBy("user_id", "session_id")
  }

  /** T3 cohort retention — the triangle matrix every growth dashboard
    * renders: users cohorted by the epoch-aligned week of their FIRST
    * purchase, then counted as retained in each later week they purchased
    * again (purchase, not any-event: the synthetic corpus has every user
    * active every week, so raw activity saturates the matrix — conversion
    * events give it real cohorts and real decay).
    * Weeks are integer `us div 7d` (epoch-aligned, engine-agnostic —
    * date_trunc('week') ISO rules are a locale trap the integer form
    * sidesteps). Scale: the (user, week) activity dedup, the per-user
    * min-week cohort, and the cohort join all key on user_id — ONE
    * exchange serves all three (Catalyst reuses the partitioning), and the
    * final rollup exchanges |cohorts x offsets| rows. No window, no
    * broadcast needed at any corpus size. */
  /** t4: dense hourly time grid + LOCF gap interpolation. The hourly
    * rollup leaves holes (39–550 empty hours per type across the SFs);
    * a per-type `sequence(min_hr, max_hr)` explode rebuilds the dense
    * grid, a left join marks the holes (n_events = 0), and
    * `last(_, ignoreNulls)` over an unbounded-preceding window carries
    * the previous present hour's value forward. 100 TB shape: the grid is
    * |types| × time-span rows — tiny next to the event scan, which
    * reduces map-side to one row per (type, hour) before any shuffle; the
    * LOCF window partitions by type, so its skew ceiling is the time
    * span, not the event volume (salt the window by coarse time range if
    * a single series' HOURS outgrow one task — not reachable here). */
  def t4GapFill(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val agg = t(spark, dir, "events")
      .select(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("hr"),
        col("value"))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("hv"))
    val grid = agg.groupBy("event_type")
      .agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hr"))
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(agg, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        last(col("hv"), ignoreNulls = true).over(w).as("locf_value"))
      .orderBy("event_type", "hr")
  }

  /** p3: Count-Min-Sketch heavy hitters — the O(1)-state frequency
    * estimator next to p2's quantile sketch and q6's HLL, but with an
    * EXACT oracle: the md5 row hash is computable on both engines, so the
    * DuckDB side rebuilds every sketch cell and hash-matches estimates,
    * not just row counts. The sketch builds in one pass with map-side
    * partial merge (elementwise-add buffers — see
    * [[graft.functions.CmsSketchAgg]]); the 4×256-long sketch then
    * collects (4 KB, corpus-size-independent) and the per-key estimate is
    * a literal-array lookup: least of the key's 4 row buckets. Output:
    * the top-20 TRUE heavy hitters with true/estimated counts — the
    * calibration table that tells a pipeline how much width its real
    * sketch deployment needs. */
  /** `estimate(key)` over a collected CMS sketch as a plan expression:
    * least of the key's per-row buckets, each a literal-array lookup —
    * shared by p3 (batch-built sketch) and st11 (stream-built sketch). */
  private[graft] def cmsEstimate(sketch: Seq[Long], key: Column,
      depth: Int = 4, width: Int = 256): Column =
    (0 until depth).map { r =>
      val row = sketch.slice(r * width, (r + 1) * width)
      val bucket = (conv(substring(md5(
        concat(lit(s"$r:"), key.cast("string"))), 1, 4), 16, 10)
        .cast("int") % width)
      element_at(typedLit(row), bucket + 1)
    }.reduce(least(_, _))

  /** The top-20 true heavy hitters of `keys` with CMS estimates from
    * `sketch` — p3/st11's shared calibration-report shape. */
  private[graft] def cmsReport(keys: DataFrame, outName: String,
      sketch: Seq[Long]): DataFrame =
    keys.groupBy(col("key").as(outName))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col(outName))
      .limit(20)
      .withColumn("est_count", cmsEstimate(sketch, col(outName)))
      .withColumn("overcount", (col("est_count") - col("true_count")).cast("long"))
      .orderBy(col("true_count").desc, col(outName))

  def p3CmsTopk(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fanOutSmallScan (r18): the CMS update pass (4 hashes/row via the
    // typed aggregator) ran on lineitem's ONE scan partition at bench
    // SFs; keyed on l_partkey so the exact-count groupBy downstream
    // reuses the same partitioning (no second exchange). No-op at
    // many-file scale. CMS merge is order/partitioning-independent.
    val keys = Tables.fanOutSmallScan(
      t(spark, dir, "lineitem").select(col("l_partkey").as("key")), "key")
    val sketch = keys.as[Long]
      .select(new graft.functions.CmsSketchAgg(4, 256).toColumn.name("cms"))
      .head()
    cmsReport(keys, "part_key", sketch)
  }

  /** p5's support threshold (rows per part). The corpus generator's
    * per-part row count is scale-invariant (~30 mean, max ~50), so 40
    * bites at every SF: 6 / 85 / 914 heavy keys at sf0.001/0.01/0.1. */
  private[operators] val HeavyHitterT = 40L

  /** p5: EXACT heavy hitters through a sketch prefilter — the
    * "sketch proposes, exact disposes" pattern (v16's two-stage
    * discipline on the frequency side). Phase 1 builds p3's CMS in one
    * map-side-merged pass, but WIDER (4×16384, 512 KB — still O(1)
    * driver state): width is what turns the sketch from a calibration
    * toy into a pruner, since the overcount is ~e·N/width. Phase 2
    * re-scans, drops every row whose key's sketch estimate is already
    * below the threshold, and exact-counts only the survivors. The
    * composition is provably EXACT, not approximate: CMS never
    * undercounts, so a truly-heavy key's estimate is ≥ its true count ≥
    * T on EVERY row — zero false negatives at any width — and the final
    * HAVING removes the false positives the collisions let through. At
    * 100 TB the win is the exchange: the exact aggregation shuffles only
    * keys that MIGHT be heavy (est ≥ T) instead of the full key space —
    * the sketch does driver-free map-side pruning the way a Bloom
    * prefilter does for x12. Exact integers end to end; the oracle is
    * the plain HAVING query, which is the point: the sketch changes the
    * PLAN, never the answer (spec-asserted against the unfiltered agg,
    * plus the pruning actually biting). */
  def p5HeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    // fanOutSmallScan (r18): same rationale as p3 — the sketch-estimate
    // prefilter evaluates 4 hash probes per row and ran single-threaded
    // on the one-partition scan; hash-clustering on the part key feeds
    // the exact groupBy with no second exchange
    val keys = Tables.fanOutSmallScan(
      t(spark, dir, "lineitem").select(col("l_partkey").as("key")), "key")
    keys
      .filter(p5Prefilter(spark, dir, col("key")))
      .groupBy(col("key").as("part_key"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= HeavyHitterT)
      .orderBy(col("n_rows").desc, col("part_key"))
  }

  /** p5's sketch prefilter as a standalone predicate over a part-key
    * column (also the spec's seam for measuring how hard it prunes). */
  private[operators] def p5Prefilter(
      spark: SparkSession, dir: String, key: Column): Column = {
    import spark.implicits._
    val (depth, width) = (4, 16384)
    // fanned out like p3/p5's key scans: the 4-hash CMS update per row is
    // the expensive part and ran on ONE scan partition at bench SFs
    val sketch = Tables.fanOutSmallScan(
        t(spark, dir, "lineitem").select(col("l_partkey").as("key")), "key")
      .as[Long]
      .select(new graft.functions.CmsSketchAgg(depth, width).toColumn.name("cms"))
      .head()
    cmsEstimate(sketch, key, depth, width) >= HeavyHitterT
  }

  /** w7: co-purchase basket pairs — the market-basket co-occurrence
    * primitive (the same shape a co-citation / term-cooccurrence pipeline
    * uses). Built as ONE basket aggregation (collect_set of parts per
    * order — the dedupe happens inside the agg) and an in-row double
    * explode emitting each unordered pair once (part_a < part_b): the r16
    * orderkey self-join computed the (order, part) distinct TWICE — once
    * per join side — and at scale its corpus-sized broadcast/SMJ is the
    * join the basket array makes unnecessary (r17, the coPurchaseEdges
    * rewrite; guide §2.4). Fan-out per order is |items|² bounded by
    * basket size (≤7 here; a web-scale basket gets a per-order item cap,
    * the x3 candidate-cap discipline). Top-20 runs as
    * TakeOrderedAndProject with full tiebreaks, so no global sort and a
    * deterministic hash. */
  def w7BasketPairs(spark: SparkSession, dir: String): DataFrame = {
    // fanOutSmallScan (r18): same rationale as GraphOps.edgeBuild — the
    // repartition replaces the basket agg's exchange; no-op at scale
    Tables.fanOutSmallScan(
        t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("part_a"), col("ps"))
      .select(col("part_a"), explode(col("ps")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** r4: PIVOT — the hourly × event-type count matrix via Spark's pivot
    * operator with an EXPLICIT value list (never the collect-distinct
    * inference pass: one scan saved and a deterministic column order,
    * which the oracle hash requires). Absent cells coalesce to 0 to match
    * SQL's FILTER counts. One partial-agg exchange on hour; the pivot is
    * a per-group projection, not a shuffle. */
  def r4PivotMatrix(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val p = t(spark, dir, "events")
      .select(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
      .groupBy("hour").pivot("event_type", types).agg(count(lit(1)))
    p.select(col("hour") +: types.map(tp => coalesce(col(tp), lit(0L)).as(tp)): _*)
      .orderBy("hour")
  }

  /** r5: UNPIVOT (melt) — r4's matrix back to long form via Spark's
    * native unpivot operator (an Expand node: each input row fans to
    * |value columns| output rows in the same task — no shuffle, no UDF).
    * Pivot and unpivot together close the reshape pair; the zero cells
    * the pivot materialized survive the round trip, which is the
    * difference between this and the plain rollup (and what the spec's
    * row-count identity checks). */
  def r5Unpivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    r4PivotMatrix(spark, dir)
      .unpivot(Array(col("hour")), types.map(col).toArray, "event_type", "n")
      .orderBy("hour", "event_type")
  }

  /** t5: truncated EWMA smoothing over the hourly series — the
    * forecasting/anomaly-baseline primitive next to t4's interpolation.
    * α = 1/2 with a 32-lag cutoff makes every weight a dyadic rational
    * (1/2^(k+1)) and every contribution n/2^(k+1) EXACT in double (count
    * significands are small; partial sums span ~40 bits), so the sum is
    * order-independent and hash-oracle-able with no decimal machinery —
    * the same no-libm reasoning as y14's log-free scoring (exactness is
    * why α is a power of two here, not a tunable float).
    * Shape: the hourly rollup (map-side combined) explodes 32 weighted
    * contributions per PRESENT hour — gaps cost nothing — then one
    * (type, hour) re-aggregation and a broadcast join back onto t4's
    * dense grid. At 100 TB the explode factor rides on the compacted
    * per-hour rollup (|types|·|hours|·32 rows), never on raw events. */
  def t5EwmaSmooth(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000L
    val a = t(spark, dir, "events")
      .select(col("event_type"), expr(s"unix_micros(ts) div $hourUs").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
    val grid = a.groupBy("event_type")
      .agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(col("event_type"), explode(sequence(col("lo"), col("hi"))).as("hr"))
    val contrib = a
      .withColumn("k", explode(sequence(lit(0L), lit(31L))))
      .select(col("event_type"), (col("hr") + col("k")).as("thr"),
        (col("n").cast("double") /
          expr("cast(shiftleft(1L, cast(k as int) + 1) as double)")).as("w"))
    val ewma = contrib.groupBy("event_type", "thr").agg(sum("w").as("ewma"))
      .withColumnRenamed("event_type", "e_type")
    grid.join(a, Seq("event_type", "hr"), "left")
      .join(ewma, col("event_type") === col("e_type") && col("hr") === col("thr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        coalesce(col("ewma"), lit(0.0)).as("ewma_value"))
      .orderBy("event_type", "hr")
  }

  def t3CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400L * 1000000L
    // DIV, not `/`: double division rounds at ~1 ulp, enough to flip a
    // quotient sitting 1.65e-12 below an integer boundary
    val wk = t(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr(s"unix_micros(ts) div $weekUs").as("wk"))
      .distinct()
    val cohort = wk.groupBy("user_id").agg(min("wk").as("cohort_wk"))
    wk.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_wk", "week_offset")
  }

  /** t6: rolling-window anomaly flags over the daily value series — the
    * monitoring query a pipeline runs on its own throughput metrics. Each
    * (event_type, day) total is compared against the trailing 7
    * OBSERVATIONS' mean/variance (row frame, so a gapped series compares
    * against the last 7 present days), and flagged when |z| > 2. The z
    * test is cross-multiplied into INTEGER-scaled decimal arithmetic —
    * `3·(7x−s)² > 14·(7·ss−s²)` with s=Σx, ss=Σx² over the frame — so
    * there is no sqrt, no division, and no float-boundary risk: the flag
    * is bit-identical on any engine (t5's exact-dyadic trick, extended to
    * second moments). Scale: one groupBy to days (map-side partial over
    * the raw events), then a window over the TINY per-day series
    * partitioned by event_type — the frame never sees raw rows. */
  def t6AnomalyFlags(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    val s = sum(col("x")).over(w)
    val ss = sum(col("x") * col("x")).over(w)
    val cnt = count(lit(1)).over(w)
    val dev = col("x") * 7 - s // 7x − s, scale-6 decimal
    daily
      .withColumn("window_n", cnt)
      .withColumn("is_anomaly",
        cnt === 7 && dev * dev * 3 > (ss * 7 - s * s) * 14)
      .select(col("event_type"), col("day"),
        col("x").cast("double").as("day_value"),
        col("window_n"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** p4: equi-width histogram — the distribution-profiling verb next to
    * p1's percentiles: event values bucketed into 10 fixed 50-unit bins
    * (last bin open-ended) per event_type, with each bin's exact count and
    * decimal-exact mass. Bucketing is `floor(value / 50)` — one IEEE
    * divide + floor, identical on both engines — capped with `least`.
    * Scale: pure per-row projection into a ≤ |types|×10-group map-side
    * partial agg; the exchange moves ≤ 50 rows. */
  def p4Histogram(spark: SparkSession, dir: String): DataFrame = {
    val width = 50.0
    t(spark, dir, "events")
      .select(col("event_type"),
        least(floor(col("value") / width), lit(9.0)).cast("long").as("bucket"),
        col("value"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("mass"))
      .withColumn("lo", col("bucket") * 50L)
      .select(col("event_type"), col("bucket"), col("lo"), col("n"), col("mass"))
      .orderBy("event_type", "bucket")
  }

  /** t7: day-of-week seasonal baseline + residual — the seasonal-
    * adjustment verb next to t6's rolling z-test: each (event_type, day)
    * total is compared against that event_type's mean for the same
    * epoch-aligned day-of-week. The baseline is ONE IEEE divide of a
    * decimal-exact sum by a count (v4's portable-mean trick), and the
    * residual subtracts two bit-identical doubles, so no rounding is
    * needed anywhere. Scale: daily rollup partial-aggregates below its
    * exchange; the |types|×7-row baseline broadcasts back onto the daily
    * series. */
  def t7SeasonalResidual(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("x"))
    val base = daily.groupBy(col("event_type"), (col("day") % 7).as("dow"))
      .agg((sum(col("x")).cast("double") / count(lit(1))).as("dow_baseline"))
    daily.withColumn("dow", col("day") % 7)
      .join(broadcast(base), Seq("event_type", "dow"))
      .select(col("event_type"), col("day"),
        col("x").cast("double").as("day_value"),
        col("dow_baseline"),
        (col("x").cast("double") - col("dow_baseline")).as("residual"))
      .orderBy("event_type", "day")
  }

  /** w9: session-transition matrix — the event-type bigram counts a
    * product-analytics / Markov-model pipeline estimates: for every pair
    * of CONSECUTIVE events of one user at most 30 minutes apart, count
    * (from_type → to_type) and its share of all transitions out of
    * from_type. One user_id exchange feeds the lag window; the matrix is
    * |types|² rows, and the share divides two exact counts in one IEEE op
    * (identical on both engines — no rounding). */
  def w9TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val pairs = t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .withColumn("prev_us", lag("us", 1).over(w))
      .filter(col("prev_type").isNotNull && col("us") - col("prev_us") <= gapUs)
    val m = pairs.groupBy(col("prev_type").as("from_type"),
        col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wf = Window.partitionBy("from_type")
    m.withColumn("p", col("n").cast("double") / sum(col("n")).over(wf))
      .orderBy("from_type", "to_type")
  }

  /** t8's synthesized changepoint: purchase days at/after this epoch day
    * carry a +μ/2 shift (the y12/y16 injection pattern — the synthetic
    * series has no real drift, so one is injected identically on both
    * engines to prove the detector end to end). */
  private val CusumShiftDay = 19743L

  /** t8: CUSUM drift detection over the daily value series — the
    * changepoint/monitoring verb next to t6's windowed z-test: t6 catches
    * single-day spikes, CUSUM accumulates SMALL persistent shifts no one
    * window flags. The one-sided recursion S_t = max(0, S_{t-1} + x_t +
    * shift_t − (μ + μ/4)) (slack k = μ/4) is cleared of ALL division by
    * scaling through 4n (series length n, s = Σx): T_t = max(0,
    * T_{t-1} + 4n·x_t − 5s + inj_t·2s) with inj ∈ {0,1} marking the
    * injected +μ/2 days, flagged when T > 4s (cumulative excess beyond
    * one average day's volume). The walk runs in EXACT micro-scaled
    * integers: the decimal(18,6) day total ×10^6 is an exact integer,
    * and the accumulator is a BigInt INSIDE the per-type group (the
    * series is calendar-bounded, so arbitrary precision costs nothing) —
    * Spark never wraps however large the corpus-scale 4n·x terms grow.
    * Both engines walk bit-identical integers and the flag has no float
    * boundary; the agreement bound is the ORACLE's side: DuckDB's BIGINT
    * recursion errors (loudly, never silently) past 2^63, which caps the
    * oracle-checkable day volume at ~9.2e12 micro-units — beyond that the
    * Spark walk stays exact and only the cross-engine check ends. The
    * injected purchase tail flags within ~4 days at every oracle-range
    * scale, while t6's 2σ spike test never sees a +0.5μ shift. The
    * recursion is
    * inherently sequential, which is exactly why it must NEVER run over
    * raw rows: the corpus aggregates to the per-day series first
    * (map-side partial below the one exchange), and the walk happens per
    * event_type over a group bounded by the DAY SPAN (~10^2 rows at any
    * corpus size — 100 TB of events still spans the same calendar),
    * sorted in memory inside flatMapGroups. Oracle = the same integer
    * recursion as a recursive CTE. */
  def t8CusumDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dayUs = 86400L * 1000000L
    val daily = t(spark, dir, "events")
      .groupBy(col("event_type"), expr(s"unix_micros(ts) div $dayUs").as("day"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("x"))
      .select(col("event_type"), col("day"),
        // decimal(38,0) micro-units: exact integer, never a wrapping cast
        (col("x") * 1000000L).cast("decimal(38,0)").as("xl"))
    val walked = daily
      .as[(String, Long, BigDecimal)]
      .groupByKey(_._1)
      .flatMapGroups { (ty: String, it: Iterator[(String, Long, BigDecimal)]) =>
        // group = one type's per-day series: bounded by the calendar span,
        // not the corpus, so sorting in memory is safe by construction —
        // and BigInt accumulation over ~10^2 rows is free, so the 4n·x
        // terms cannot wrap at any corpus volume
        val rows = it.toArray.sortBy(_._2).map { case (_, day, x) =>
          (day, x.toBigInt)
        }
        val n = BigInt(rows.length)
        val s = rows.iterator.map(_._2).sum
        var tAcc = BigInt(0)
        rows.iterator.map { case (day, xl) =>
          val inj = if (ty == "purchase" && day >= CusumShiftDay) BigInt(2) else BigInt(0)
          tAcc = (tAcc + 4 * n * xl - 5 * s + inj * s).max(BigInt(0))
          // S_t = T/(4n·10^6): exact integer -> double, then ONE IEEE
          // divide — the same two rounding steps the oracle's
          // CAST(t AS DOUBLE)/(CAST(n AS DOUBLE)*4e6) performs
          (ty, day, xl.toDouble / 1e6,
            tAcc.toDouble / (n.toDouble * 4000000.0), tAcc > 4 * s)
        }
      }
    walked.toDF("event_type", "day", "day_value", "cusum", "is_drift")
      .orderBy("event_type", "day")
  }

  /** r6: SCD2 (slowly-changing-dimension type 2) history build — the
    * warehouse temporal-modeling verb: each user's CONSECUTIVE RUN of one
    * event_type becomes one versioned row with [valid_from, valid_to)
    * bounds, a per-user version number, and an is_current flag on the
    * open-ended run. Run starts are lag() change-points; valid_to is the
    * NEXT run's start via lead() over the change-points only — both
    * windows share one user_id exchange and one (us, event_id) sort, and
    * the output is change-points only (≪ events). The (ts, event_id)
    * order is total, so runs and versions are deterministic. Scale: one
    * hash exchange on user_id; per-user state is a window frame of 1. */
  def r6Scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("valid_to", lead("us", 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from"), col("valid_to"),
        col("version").cast("long").as("version"),
        col("valid_to").isNull.as("is_current"))
      .orderBy("user_id", "version")
  }

  /** w10: association rules over w7's co-occurrence pairs — the
    * market-basket mining verb completed: the top-20 pairs annotated with
    * support, both directed confidences, and lift (the recommendation /
    * cross-sell planning table). Every metric is a ratio of EXACT counts
    * — each one fixed IEEE division (or one multiply per side for lift),
    * identical on both engines; ranking stays on the exact pair count
    * with full tiebreaks. Scale: the pair self-join is w7's (fan-out
    * bounded by basket size); the per-item count table shuffles once on
    * partkey and joins the 20-row pair list (broadcast by size); the
    * 1-row basket total is a PlanLint-whitelisted O(1) cross join. */
  def w10AssocRules(spark: SparkSession, dir: String): DataFrame = {
    // ONE basket aggregation feeds all three statistics (r17, the w7/
    // coPurchaseEdges rewrite): pairs explode in-row from each order's
    // part set, per-part basket counts explode the same arrays, and the
    // basket total is the frame's row count — the three subtrees are
    // identical up to the basket agg, so ReuseExchange ships the one
    // shuffle to all of them (the r16 form computed the (order, part)
    // distinct per consumer and self-joined it for the pairs).
    val baskets = Tables.fanOutSmallScan(
        t(spark, dir, "lineitem").select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
    val pairs = baskets
      .select(explode(col("ps")).as("part_a"), col("ps"))
      .select(col("part_a"), explode(col("ps")).as("part_b"))
      .filter(col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b").agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
    val cnts = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("cnt"))
    val nb = baskets.agg(count(lit(1)).as("n_baskets"))
    val n = col("n_orders").cast("double")
    pairs
      .join(cnts.select(col("l_partkey").as("part_a"), col("cnt").as("cnt_a")), "part_a")
      .join(cnts.select(col("l_partkey").as("part_b"), col("cnt").as("cnt_b")), "part_b")
      .join(nb)
      .select(col("part_a"), col("part_b"), col("n_orders"),
        (n / col("n_baskets")).as("support"),
        (n / col("cnt_a")).as("conf_a_b"),
        (n / col("cnt_b")).as("conf_b_a"),
        ((n * col("n_baskets")) / (col("cnt_a").cast("double") * col("cnt_b")))
          .as("lift"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
  }

  /** t9: OHLC series downsampling — the metrics/financial resample verb
    * next to t4's gap-fill: per (event_type, epoch week), the opening and
    * closing observation plus high/low/volume. Open/close are ONE
    * lexicographic min/max(struct(us, event_id, value)) each (w8/j5's
    * argmin bridge — no window, no row_number, ties total-ordered by
    * event_id), high/low are plain extremes, and the value mass sums in
    * decimal — everything either exact or a single comparison, so both
    * engines agree bitwise. Scale: one map-side partial agg below one
    * exchange of ≤ |types|×|weeks| groups; the raw events never move
    * twice. */
  def t9WeeklyOhlc(spark: SparkSession, dir: String): DataFrame = {
    val wkUs = 7L * 86400L * 1000000L
    t(spark, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("value"))
      .groupBy(col("event_type"), expr(s"us div $wkUs").as("week"))
      .agg(
        min(struct(col("us"), col("event_id"), col("value"))).getField("value")
          .as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("us"), col("event_id"), col("value"))).getField("value")
          .as("close"),
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("mass"))
      .orderBy("event_type", "week")
  }

  /** Touch channels w8 credits a purchase to, and its lookback horizon. */
  private val TouchTypes = Seq("click", "view")
  private val AttributionLookbackUs = 3L * 86400L * 1000000L

  /** w8: first/last-touch revenue attribution — for every purchase, the
    * user's earliest and latest touch event (click/view) in the 3 days
    * before it get the credit; a purchase with no touch in the window is
    * 'direct'. Per channel: purchases and revenue credited under each
    * model. The per-purchase argmin/argmax is ONE lexicographic
    * min/max(struct(ts, event_id, channel)) per side — no window, no
    * row_number, and ties break on event_id so the pick is total-ordered.
    * Scale: the join is equi on user_id with the range predicate applied
    * in the join filter — fan-out is bounded by one user's touch density
    * within 3 days, never the corpus; revenue sums in decimal so the
    * rollup is partition-order-independent. */
  def w8Attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("p_user"),
        unix_micros(col("ts")).as("pus"), col("value"))
    val touch = ev.filter(col("event_type").isin(TouchTypes: _*))
      .select(col("user_id").as("t_user"), unix_micros(col("ts")).as("tus"),
        col("event_id").as("tid"), col("event_type").as("ch"))
    val joined = p.join(touch,
      col("p_user") === col("t_user") &&
        col("tus") < col("pus") &&
        col("tus") >= col("pus") - AttributionLookbackUs,
      "left")
    val perPurchase = joined
      .groupBy("event_id")
      .agg(first(col("value")).as("value"),
        min(struct(col("tus"), col("tid"), col("ch"))).getField("ch").as("first_ch"),
        max(struct(col("tus"), col("tid"), col("ch"))).getField("ch").as("last_ch"))
    perPurchase
      .select(col("value"),
        explode(map(lit("first"), col("first_ch"), lit("last"), col("last_ch")))
          .as(Seq("role", "ch")))
      .select(col("value"), col("role"),
        coalesce(col("ch"), lit("direct")).as("channel"))
      .groupBy("channel")
      .agg(
        sum(when(col("role") === "first", 1L).otherwise(0L)).as("n_first"),
        sum(when(col("role") === "first", col("value").cast("decimal(18,6)")))
          .cast("double").as("rev_first"),
        sum(when(col("role") === "last", 1L).otherwise(0L)).as("n_last"),
        sum(when(col("role") === "last", col("value").cast("decimal(18,6)")))
          .cast("double").as("rev_last"))
      .orderBy("channel")
  }
}
