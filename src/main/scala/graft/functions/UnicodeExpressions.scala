package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared normalization kernel for [[UnicodeNormalize]] — static so the
  * generated code calls straight into it.
  */
object UnicodeKernel {
  val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formId(name: String): Int = name match {
    case "NFC" => 0; case "NFD" => 1; case "NFKC" => 2; case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (NFC|NFD|NFKC|NFKD)")
  }

  def normalize(s: UTF8String, formId: Int): UTF8String = {
    // ASCII fast path: every normalization form is the identity on
    // pure-ASCII text, and most corpus bytes are ASCII — skip the
    // String round trip entirely (single byte scan, no allocation)
    var i = 0
    val n = s.numBytes
    var ascii = true
    while (ascii && i < n) { if (s.getByte(i) < 0) ascii = false; i += 1 }
    if (ascii) return s
    val j = s.toString
    val form = Forms(formId)
    if (Normalizer.isNormalized(j, form)) s
    else UTF8String.fromString(Normalizer.normalize(j, form))
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a codegen'd Catalyst
  * expression — the corpus-cleaning primitive exact dedup depends on:
  * the same visible text in composed vs decomposed form (é vs e+U+0301)
  * hashes to different fingerprints, so un-normalized corpora
  * under-deduplicate. Spark ships no normalization function; a Scala
  * UDF would serialize per row and block codegen. This stays inside
  * whole-stage codegen with an ASCII fast path that returns the input
  * buffer untouched (no allocation) for the dominant case.
  *
  * Cross-engine oracle: DuckDB's `nfc_normalize` (NFC only — both
  * implement the same Unicode canonical composition).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val formId = UnicodeKernel.formId(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string column, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UnicodeKernel.normalize(input.asInstanceOf[UTF8String], formId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnicodeKernel.normalize($c, $formId);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "unicode_normalize"
}
