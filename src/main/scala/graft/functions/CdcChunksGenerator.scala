package graft.functions

import graft.core.{Chunker, DedupeSettings}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst Generator (UDTF) exposing the CDC chunker in SQL:
 *
 *   SELECT doc_id, c.* FROM docs
 *   LATERAL VIEW cdc_chunks(payload, 256, 2048, 8, 1) c
 *     AS chunk_key, length, position, address
 *
 * One input binary column fans out to one row per content-defined chunk
 * (SURVEY §4's suggested SQL exposure of operator A3). Generators are
 * driver-agnostic pure functions, so chunk keys are identical on any
 * partitioning — the invariant distributed dedupe rests on.
 */
case class CdcChunksGenerator(
    child: Expression, minE: Expression, maxE: Expression,
    shiftE: Expression, boundaryE: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, minE, maxE, shiftE, boundaryE)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_key", StringType, nullable = false),
    StructField("length", IntegerType, nullable = false),
    StructField("position", IntegerType, nullable = false),
    StructField("address", LongType, nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val params = Seq(minE, maxE, shiftE, boundaryE)
    // params are eval(null)'d once at open — they must be literals, or the
    // query would pass analysis and then NPE (column ref) / silently pin one
    // row's value (non-deterministic expr) inside every task at runtime
    if (child.dataType != BinaryType || params.exists(_.dataType != IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cdc_chunks(binary, int, int, int, int) expected")
    else if (!params.forall(_.foldable))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cdc_chunks chunking parameters must be literals (foldable)")
    else if (params.exists(_.eval(null) == null))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "cdc_chunks chunking parameters must not be null")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val settings = DedupeSettings(
    minE.eval(null).asInstanceOf[Int], maxE.eval(null).asInstanceOf[Int],
    shiftE.eval(null).asInstanceOf[Int], boundaryE.eval(null).asInstanceOf[Int])

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val bytes = child.eval(input).asInstanceOf[Array[Byte]]
    if (bytes == null || bytes.isEmpty) Nil
    else Chunker.chunk(bytes, settings).map { c =>
      InternalRow(UTF8String.fromString(c.chunkKey), c.length, c.position, c.address)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CdcChunksGenerator =
    copy(child = newChildren(0), minE = newChildren(1), maxE = newChildren(2),
      shiftE = newChildren(3), boundaryE = newChildren(4))
}
