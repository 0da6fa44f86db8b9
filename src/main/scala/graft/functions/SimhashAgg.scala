package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * SimHash as a typed Aggregator: input is a feature hash (xxhash64 of a
 * shingle), the buffer is the 64 per-bit vote counters, the result is the
 * 64-bit fingerprint. One tight while-loop per feature — replaces a
 * 64-column conditional-sum aggregate whose generated code falls out of
 * JIT/codegen limits (measured ~10x slower at 260k features).
 * Partial buffers combine associatively, so map-side combine applies.
 */
object SimhashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(b: Array[Int], h: Long): Array[Int] = {
    var i = 0
    while (i < 64) {
      b(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1)
      i += 1
    }
    b
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Int]): Long = {
    var out = 0L
    var i = 0
    while (i < 64) {
      if (b(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
