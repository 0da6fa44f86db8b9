package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's index-query surface (SURVEY.md §2 B/C/D/E/F/G) re-expressed
 * over the driver's test corpus so each operator is DuckDB-checkable:
 * `orders`/`lineitem` stand in for object/objmap (an order's lineitems tile a
 * quantity range the way an object's chunks tile its byte range), `documents`
 * stands in for a content-keyed chunk store.
 *
 * Every query is deterministic (explicit sort keys) and uses exact-decimal
 * money sums (Tables.moneySum) so Spark and DuckDB agree bitwise.
 */
object IndexQueries {
  import Tables._

  /** B1 Exists — equality existence probe as a semi-join
    * (reference: DedupeLibrary.cs:562-566 / SqliteProvider.cs:258-270). */
  def b1Exists(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(c("c_custkey"), c("c_name"))
      .orderBy("c_custkey")
  }

  /** B2/B5 point lookup — equality filter + projection
    * (reference: SqliteProvider.cs:282-305,312-326). */
  def b2PointLookup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(col("doc_id") === 42)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))

  /** B4 GetChunks — the reference's manual distinct+IN semi-join
    * (reference: SqliteProvider.cs:333-355). */
  def b4SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val l = t(spark, dir, "lineitem")
    p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
      .select(p("p_partkey"), p("p_name"))
      .orderBy("p_partkey")
  }

  /** C1 GetObjectMapForPosition — interval containment lookup, the
    * reference's only raw SQL (reference: SqliteProvider.cs:363-393).
    * Generalized to every "object": for each order, find the lineitem
    * whose cumulative-quantity range covers the order's midpoint.
    * Quantities are integer-valued doubles, so the cumulative addresses
    * are exact in both engines.
    */
  def c1PositionLookup(spark: SparkSession, dir: String): DataFrame = {
    val l = t(spark, dir, "lineitem")
    // l_linenumber is NOT unique within an order in this corpus — the full
    // tiebreak chain makes the cumulative address deterministic across
    // engines (rows still tied after it are identical in every projected
    // column, so the output is order-insensitive).
    val wOrd = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_partkey", "l_extendedprice", "l_quantity")
    l.withColumn("addr",
        coalesce(sum("l_quantity").over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0.0)))
      // whole-partition total in the SAME window spec (same partitioning and
      // ordering, unbounded frame) so both sums share one WindowExec sort
      .withColumn("total", sum("l_quantity").over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("addr") <= col("total") / 2 && col("addr") + col("l_quantity") > col("total") / 2)
      .select(col("l_orderkey"), col("l_linenumber"), col("addr"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "addr")
  }

  /** D1 ListObjects — prefix filter + keyset pagination + limit
    * (reference: SqliteProvider.cs:203-247). */
  def d1ListPrefix(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .filter(col("c_name").startsWith("Customer#00000001") && col("c_name") > "Customer#000000012")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_name")
      .limit(10)

  /** E1/E2 IndexStats — object/chunk counts, logical/physical bytes and
    * dedupe ratios (reference: SqliteProvider.cs:155-190,
    * IndexStatistics.cs:81-108). `documents` is the object store; content
    * identity is md5(text).
    */
  def e1IndexStats(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val logical = d.agg(
      count(lit(1)).as("object_count"),
      sum("n_chars").as("logical_chars"))
    val physical = d.groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(max("n_chars").as("len"))
      .agg(count(lit(1)).as("chunk_count"), sum("len").as("physical_chars"))
    logical.crossJoin(physical)
      .withColumn("ratio_x",
        when(col("physical_chars") === 0 || col("logical_chars") === 0, lit(0.0))
          .otherwise(round(col("logical_chars").cast("double") / col("physical_chars"), 4)))
      .select("object_count", "chunk_count", "logical_chars", "physical_chars", "ratio_x")
  }

  /** E3 per-object rollup at write (reference: DedupeLibrary.cs:233):
    * per order, chunkCount + total length. */
  def e3ObjectRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("chunk_count"),
        sum(col("l_quantity")).cast("double").as("original_length"),
        moneySum(col("l_extendedprice")).as("total_price"))
      .orderBy("l_orderkey")

  /** F1 GC orphan detection — left-anti join (reference:
    * SqliteProvider.cs:495-526): customers with no order since 2000,
    * i.e. "unreferenced entries eligible for collection". */
  def f1GcOrphans(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01 00:00:00").cast("timestamp"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal").cast("double").as("acctbal"))
      .orderBy("c_custkey")
  }

  /** A6 derived refcounts — groupBy count over content keys
    * (reference: SqliteProvider.cs:463-484, derived per SURVEY §2-A6). */
  def a6Refcounts(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("chunk_key"))
      .agg(count(lit(1)).as("ref_count"), max("n_chars").as("length"))
      .orderBy("chunk_key")

  /** G1 reconstruction — ordered concat of an object's chunks
    * (reference: DedupeLibrary.cs:377-404): per order, its lineitems'
    * part keys concatenated in line order. */
  def g1Reconstruct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(concat_ws(",",
        transform(
          // sort on (linenumber, partkey): linenumber alone is non-unique,
          // and ties on both yield identical output elements either way
          array_sort(collect_list(struct(col("l_linenumber"), col("l_partkey")))),
          x => x.getField("l_partkey").cast("string"))).as("chunk_seq"))
      .orderBy("l_orderkey")
}
