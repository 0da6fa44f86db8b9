package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions registering graft's native functions for SQL:
 *
 *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions
 *   // or: SparkSession.builder().withExtensions(new GraftExtensions)
 *   // or, on an existing session: GraftExtensions.register(spark)
 *
 *   SELECT dot_f(a.embedding, b.embedding) ...
 *   SELECT ... LATERAL VIEW cdc_chunks(payload, 1024, 32768, 32, 2) c
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private type Builder = Seq[Expression] => Expression

  val functions: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("dot_f",
      new ExpressionInfo(classOf[DotProductF].getName, "dot_f"),
      (args: Seq[Expression]) => DotProductF(args(0), args(1))),
    ("cdc_chunks",
      new ExpressionInfo(classOf[CdcChunksGenerator].getName, "cdc_chunks"),
      (args: Seq[Expression]) =>
        CdcChunksGenerator(args(0), args(1), args(2), args(3), args(4))),
    ("sorted_intersect_size",
      new ExpressionInfo(
        classOf[SortedIntersectSize].getName, null, "sorted_intersect_size",
        // the precondition must be SQL-visible (DESCRIBE FUNCTION): on
        // unsorted/non-distinct arrays the two-pointer merge UNDERCOUNTS
        // silently, which an ad-hoc user comparing against array_intersect
        // would otherwise read as a bug
        "sorted_intersect_size(a, b) - |a ∩ b| over two array<bigint> inputs " +
          "that MUST each be sorted ascending with distinct elements " +
          "(undercounts silently otherwise). Intended for pipelines that " +
          "pre-sort, e.g. graft shingle arrays; use size(array_intersect(a, b)) " +
          "for arbitrary arrays.",
        "arguments: a array<bigint> sorted-distinct, b array<bigint> sorted-distinct"),
      (args: Seq[Expression]) => SortedIntersectSize(args(0), args(1))),
    ("nfc_normalize",
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args(0))))

  /** Register on an already-built session (tests, driver harness). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
