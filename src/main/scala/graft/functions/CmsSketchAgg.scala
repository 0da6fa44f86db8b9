package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/**
 * Count-Min Sketch as a mergeable typed aggregator: a depth×width matrix
 * of counters; each incoming key increments one bucket per row (row-keyed
 * hash), and `estimate(key) = min over rows of its buckets` — always an
 * OVERcount, never under. The buffer merges by elementwise addition, so
 * Spark applies map-side partial aggregation and the driver receives one
 * depth×width array per group regardless of input volume: O(1) state for
 * frequency estimation, the sketch analog of p2's quantile summary.
 *
 * The row hash is md5 of `"r:key"` (first two bytes mod width) — chosen
 * NOT for speed but because both engines can compute it exactly, which
 * makes the whole sketch — every cell, every estimate — reproducible in
 * the DuckDB oracle. A production deployment swaps in a cheap pairwise
 * hash; the sketch algebra is unchanged.
 */
final class CmsSketchAgg(depth: Int = 4, width: Int = 256)
    extends Aggregator[Long, Array[Long], Seq[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CmsSketchAgg.bucket(r, key, width)) += 1
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object CmsSketchAgg {
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Bucket of `key` in sketch row `r`: the first two md5 bytes of
    * "r:key", big-endian, mod width — exactly SQL's
    * `('0x' || substr(md5(r || ':' || key), 1, 4))::INT % width`. */
  def bucket(r: Int, key: Long, width: Int): Int = {
    val d = md5.get()
    d.reset()
    val h = d.digest(s"$r:$key".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((h(0) & 0xff) << 8) | (h(1) & 0xff)) % width
  }
}
