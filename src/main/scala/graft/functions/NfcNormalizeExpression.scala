package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` — Unicode NFC normalization as a native
  * Catalyst expression with real codegen, the text-cleanup primitive
  * every corpus ingest pass runs before hashing or deduplication
  * (decomposed "a" + U+0301 and precomposed "á" must hash identically
  * or every dedup/fingerprint tier silently misses equal content).
  *
  * Per-row, pure, and allocation-light: the common case (already-NFC
  * ASCII corpus text) is detected with `Normalizer.isNormalized` and
  * returns the INPUT UTF8String untouched — no String round-trip at
  * all on the hot path. `doGenCode` emits one static call, so the
  * expression stays inside whole-stage codegen.
  */
case class NfcNormalizeExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalizeExpression.nfcUtf8(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.NfcNormalizeExpression.nfcUtf8($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpression {

  /** Static entry point shared by interpreted eval and generated code. */
  def nfcUtf8(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API. */
  def nfc_normalize(c: Column): Column =
    Bridge.column(NfcNormalizeExpression(Bridge.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(text)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalizeExpression(exprs.head), "built-in")
}
