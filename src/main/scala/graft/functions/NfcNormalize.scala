package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * composition) of a string column — the first step of any text-cleaning
  * pipeline: byte-identical text must hash identically, and the same
  * visible character can arrive precomposed (U+00E9) or decomposed
  * (U+0065 U+0301) depending on the source. Spark has no normalization
  * built-in; a Scala UDF would force the projection out of whole-stage
  * codegen, so this is a proper codegen'd expression like the other
  * graft kernels.
  *
  * Semantics: `java.text.Normalizer.normalize(s, NFC)` — the same
  * canonical composition DuckDB's `nfc_normalize` (utf8proc) computes,
  * which is what the t14 oracle gate pins (md5 of the normalized text
  * must match across engines).
  *
  * Fast path: `Normalizer.isNormalized` runs the NFC quick-check first —
  * for ASCII (the overwhelming majority of real corpora at scale) it is
  * a single pass with no allocation, and the input UTF8String is
  * returned unchanged. Only strings that actually contain decomposed
  * sequences pay for re-encoding.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared by the interpreted and generated paths — one semantics. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API: `NfcNormalize(col)`. */
  def apply(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(text)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "nfc_normalize")
}
