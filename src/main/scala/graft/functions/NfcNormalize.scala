package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization as a native codegen'd expression — the text
 * canonicalization step of a corpus-cleaning pipeline (decomposed
 * combining sequences, compatibility variants from OCR/PDF extraction,
 * etc. collapse to one canonical form so dedupe hashing and tokenization
 * see one spelling). Named after — and oracle-checked against — DuckDB's
 * `nfc_normalize`; both sides implement the same Unicode standard, so the
 * outputs are byte-identical.
 *
 * A plain Scala UDF would do the same work but (a) boxes in/out of the
 * codegen'd pipeline and (b) is opaque to Catalyst (blocks nested-column
 * pruning above it). This stays inside whole-stage codegen: one static
 * call on the JDK's `java.text.Normalizer`, no boxing beyond the
 * String/UTF8String bridge the JDK API forces. The fast path skips the
 * bridge entirely: `Normalizer.isNormalized` on an already-NFC string
 * (the overwhelming case in a mostly-clean corpus) avoids allocating the
 * normalized copy.
 */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize(string) expected, got ${child.dataType}")

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Static bridge shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.graft.ColumnBridge
  /** Column API: `nfc_normalize(s)`. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
