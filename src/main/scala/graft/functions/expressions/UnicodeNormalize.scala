package graft.functions.expressions

import java.text.Normalizer
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by the interpreted and codegen paths of the
  * Unicode expressions (codegen emits a plain static call — the generated
  * Java cannot close over Scala state).
  */
object UnicodeOps {
  // \p{Mn} = nonspacing combining marks: exactly what accent-stripping
  // removes after canonical decomposition (é → e + U+0301 → e). Compiled
  // once per JVM, not per row.
  private val CombiningMarks = Pattern.compile("\\p{Mn}+")

  def normalize(s: UTF8String, form: String): UTF8String = {
    val f = form match {
      case "NFC" => Normalizer.Form.NFC
      case "NFD" => Normalizer.Form.NFD
      case "NFKC" => Normalizer.Form.NFKC
      case "NFKD" => Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unicode_norm form must be NFC|NFD|NFKC|NFKD, got '$other'")
    }
    UTF8String.fromString(Normalizer.normalize(s.toString, f))
  }

  def stripAccents(s: UTF8String): UTF8String =
    UTF8String.fromString(CombiningMarks.matcher(
      Normalizer.normalize(s.toString, Normalizer.Form.NFD)).replaceAll(""))
}

/** Unicode normalization (`unicode_norm(text, 'NFC')` in SQL) — the
  * canonicalization pass a multilingual corpus pipeline runs before
  * fingerprinting/dedup, so that composed and decomposed encodings of the
  * same text (e.g. U+00E9 vs e + U+0301) hash identically. Spark ships no
  * normalization builtin; this is a native codegen expression (a static
  * JDK-`Normalizer` call per row — no UDF serialization, stays inside
  * whole-stage codegen). The form is fixed at plan time: an invalid form
  * fails analysis, not per-row at runtime.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  private val validForm = Set("NFC", "NFD", "NFKC", "NFKD")(form)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!validForm) TypeCheckResult.TypeCheckFailure(
      s"$prettyName form must be NFC|NFD|NFKC|NFKD, got '$form'")
    else if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_norm"

  override def nullSafeEval(input: Any): Any =
    UnicodeOps.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"""graft.functions.expressions.UnicodeOps.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping (`strip_accents(text)` in SQL): canonical decompose,
  * then drop nonspacing combining marks — é→e, ü→u, ñ→n. Matches DuckDB's
  * `strip_accents` on Latin text (both decompose then drop Mn), which is
  * what makes the query oracle-checkable. Compatibility-only glyphs
  * (ligatures, fullwidth forms) are NOT touched — that is NFKC's job, not
  * accent stripping's.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.catalogString)

  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeOps.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.expressions.UnicodeOps.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
