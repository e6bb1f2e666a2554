package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column to a canonical/compatibility
  * form (NFC/NFD/NFKC/NFKD) — the text-cleanup pass every web-scale
  * corpus runs before tokenization (combining-sequence composition,
  * fullwidth → ASCII under NFKC, ligature expansion), which Spark has no
  * built-in for. `java.text.Normalizer` implements exactly the Unicode
  * UAX #15 forms, so results agree byte-for-byte with any conformant
  * engine (DuckDB's `nfc_normalize` for the NFC oracle).
  *
  * A JVM-intrinsic per-row call beats both a Scala UDF (ser/de per row)
  * and any declarative contortion (there is none — normalization is a
  * stateful scan of the code-point sequence). `CodegenFallback` is
  * deliberate: the Normalizer call dominates; fast-path rows that are
  * already in-form short-circuit via `Normalizer.isNormalized` (the
  * common case for ASCII-heavy corpora — a pure scan, no allocation).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val f = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType.simpleString}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of NFC/NFD/NFKC/NFKD, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, f)) input
    else UTF8String.fromString(Normalizer.normalize(s, f))
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnicodeNormalize = copy(child = newChild)
}

object UnicodeNormalize {
  import org.apache.spark.sql.Column

  def apply(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.bridge.column(
      UnicodeNormalize(org.apache.spark.sql.graft.bridge.expression(c), form))
}
