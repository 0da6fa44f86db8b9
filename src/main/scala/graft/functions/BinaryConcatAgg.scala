package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/**
 * Typed Aggregator concatenating (address, bytes) chunk pairs in address
 * order — the distributed reconstruction path (SURVEY §4's suggested
 * ordered-binary-concat aggregate): partial buffers accumulate unordered
 * on executors (map-side combine), merge unions them, and the final sort
 * happens once per group at finish. Reconstructing N objects is one
 * groupBy(objectKey).agg(binary_concat(...)) — no driver loop.
 */
object BinaryConcatAgg extends Aggregator[(Long, Array[Byte]), ArrayBuffer[(Long, Array[Byte])], Array[Byte]] {

  override def zero: ArrayBuffer[(Long, Array[Byte])] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Array[Byte])],
      a: (Long, Array[Byte])): ArrayBuffer[(Long, Array[Byte])] = { b += a; b }

  override def merge(l: ArrayBuffer[(Long, Array[Byte])],
      r: ArrayBuffer[(Long, Array[Byte])]): ArrayBuffer[(Long, Array[Byte])] = { l ++= r; l }

  override def finish(buf: ArrayBuffer[(Long, Array[Byte])]): Array[Byte] = {
    val sorted = buf.sortBy(_._1)
    val out = new Array[Byte](sorted.iterator.map(_._2.length).sum)
    var off = 0
    sorted.foreach { case (_, bytes) =>
      System.arraycopy(bytes, 0, out, off, bytes.length); off += bytes.length
    }
    out
  }

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Array[Byte])]] =
    Encoders.kryo[ArrayBuffer[(Long, Array[Byte])]]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
