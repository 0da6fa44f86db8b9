package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Data-layout operators: the write-side clustering that makes 100 TB
 * READS cheap. A parquet lake prunes with per-file min/max statistics;
 * pruning quality is decided by how tightly each file's value ranges hug
 * the rows it holds. Z-order (Morton) interleaving is the standard
 * multi-dimension clustering key (Delta/Iceberg `OPTIMIZE ZORDER BY`):
 * sorting by interleaved bits gives every contiguous run of rows a tight
 * RECTANGLE in (dim1, dim2) space, so predicates on EITHER dimension —
 * not just the leading sort key — skip most files.
 *
 * No counterpart in the reference (single-node SQLite index scans); this
 * is greenfield scale surface like the k1/j-family operators.
 */
object LayoutOps {
  import Tables._

  /** Fixed epoch-day base of the corpus date range (probed 9132..11630 at
    * every SF — the generator's range is scale-invariant); div 10 then an
    * 8-bit clamp quantizes to 0..249. */
  private val DayBase = 9132L

  /** Morton interleave of two 8-bit-quantized ints, bit b of x → bit 2b,
    * bit b of y → bit 2b+1 — built as one flat 16-term integer sum so the
    * whole key is a single codegen'd projection (and the SQL twin below
    * is the same formula verbatim). */
  private def zInterleave(x: Column, y: Column): Column =
    (0 until 8).map { b =>
      (shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)): Column
    }.reduce(_ + _)

  /** The same interleave as SQL text, for the DuckDB oracle: one formula,
    * two renderings, built from the same loop bounds. */
  def zInterleaveSql(x: String, y: String): String =
    (0 until 8).map { b =>
      s"((($x >> $b) & 1) << ${2 * b}) + ((($y >> $b) & 1) << ${2 * b + 1})"
    }.mkString(" + ")

  /** z5: Z-order clustering audit over lineitem on (quantity, ship-day).
    * Quantize both dims to 8 bits, Morton-interleave, and roll up the 256
    * coarse z-buckets (top 8 bits = a 16×16 grid cell): row count plus
    * each bucket's min/max extent in BOTH dimensions. The extents ARE the
    * min/max stats a writer laying files out in z-order would give every
    * file — tight rectangles (≤ ~16 units per dim per bucket, vs the full
    * 50×250 range a date-sorted layout gives the quantity dim) are what
    * turn per-file stats into real two-dimensional scan pruning.
    * Integer-exact end to end; one scan, one 256-group rollup — at 100 TB
    * the map-side partial agg reduces each task to ≤256 rows before the
    * shuffle. */
  def z5ZorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400L * 1000000L
    val li = t(spark, dir, "lineitem")
      .withColumn("qx", col("l_quantity").cast("long"))
      // integer div end to end — `/` is IEEE double division in Spark SQL
      .withColumn("qy", least(lit(255L), greatest(lit(0L), expr(
        s"(unix_micros(cast(l_shipdate as timestamp)) div $dayUs - $DayBase) div 10"))))
    li.withColumn("zbucket", shiftright(zInterleave(col("qx"), col("qy")), 8))
      .groupBy("zbucket")
      .agg(count(lit(1)).as("n_rows"),
        min("qx").as("qty_lo"), max("qx").as("qty_hi"),
        min("qy").as("day_lo"), max("qy").as("day_hi"))
      .orderBy("zbucket")
  }

  /** Target shard payload for z6's bin-pack plan (chars per output shard). */
  private[operators] val ShardChars = 50000L

  /** z6: output-shard bin-packing — the shard-writer PLAN a corpus export
    * runs before materializing files: documents concatenate per source in
    * doc_id order and a doc belongs to the shard its START offset falls
    * in (whole-doc units — the file-writer convention, vs z3's token-level
    * chop where documents SPLIT across sequences). Emits the per-shard
    * manifest (doc count, char payload, id range) that becomes the file
    * plan; the payload hovers just over [[ShardChars]] because the
    * straddling doc stays whole. Scale: the window partitions by source —
    * embarrassing parallelism across sources; ONE pathological mega-source
    * re-ranks through the ExactOffsets scaffold instead (same output,
    * y9/z3's discipline). Only (id, source, n_chars) rows shuffle. */
  def z6ShardBinpack(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    t(spark, dir, "documents").select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("fin", sum("n_chars").over(w))
      .withColumn("shard", expr(s"(fin - n_chars) DIV $ShardChars"))
      .groupBy("source", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("shard_chars"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("source", "shard")
  }

  /** The z5 oracle: same quantization constants and the SAME generated
    * interleave formula (one loop renders both engines' expressions). */
  def z5OracleSql: String =
    s"""WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS qx,
       |    least(255, greatest(0, (epoch_us(l_shipdate) // 86400000000 - $DayBase) // 10)) AS qy
       |  FROM lineitem),
       |z AS (SELECT qx, qy, ${zInterleaveSql("qx", "qy")} AS zv FROM b)
       |SELECT zv >> 8 AS zbucket, count(*) AS n_rows,
       |  min(qx) AS qty_lo, max(qx) AS qty_hi, min(qy) AS day_lo, max(qy) AS day_hi
       |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin
}
