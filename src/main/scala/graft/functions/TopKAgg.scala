package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded top-k aggregator: keeps the k largest (score, tag) pairs per
 * group, ordered by (score DESC, tag ASC). The window-function formulation
 * (`row_number() over (partition by g order by s desc) <= k`) must SORT
 * every group's full row set; this aggregator holds only k entries per
 * group, combines partials associatively (map-side combine applies), and
 * never materializes or orders the non-top rows — at 100 TB the difference
 * between a full shuffle-sort of the fact table and a k-row state per key.
 *
 * Buffer is a plain sorted array (k is small); `merge` interleaves two
 * sorted arrays. Result is the final sorted (score, tag) list.
 */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)], Seq[(Double, Long)]] {

  // "better than", via Double.compare so NaN has a total-order position
  // (raw > / == are both false for NaN, which would let a NaN score occupy
  // a slot non-deterministically and interleave differently across merges)
  private def lt(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    if (buf.length == k && !lt(x, buf(k - 1))) buf
    else {
      // insert in order, drop the worst beyond k
      val out = new Array[(Double, Long)](math.min(buf.length + 1, k))
      var i = 0; var j = 0; var placed = false
      while (j < out.length) {
        if (!placed && (i >= buf.length || lt(x, buf(i)))) { out(j) = x; placed = true }
        else { out(j) = buf(i); i += 1 }
        j += 1
      }
      out
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var m = 0
    while (m < out.length) {
      out(m) =
        if (i < a.length && (j >= b.length || lt(a(i), b(j)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      m += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Seq[(Double, Long)] = buf.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
