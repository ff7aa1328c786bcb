package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text STRING) → STRING`: Unicode NFC normalization as
  * a native codegen Catalyst expression — the canonicalization every
  * training pipeline runs before dedup/tokenization (decomposed
  * `e`+COMBINING ACUTE and precomposed `é` must hash identically or
  * near-dup/exact-dup both silently under-merge). Spark has no built-in
  * for it; a Scala UDF would box and break WholeStageCodegen, so like
  * [[LangId]] this emits a direct static call from `doGenCode`.
  *
  * Fast path: normalization is checked before it is performed
  * (`Normalizer.isNormalized`) and already-NFC strings — the
  * overwhelming majority of real text — return the INPUT UTF8String,
  * zero-copy, no re-encode.
  *
  * Same name and semantics as DuckDB's `nfc_normalize`, which is the
  * q54 oracle.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  protected override def nullSafeEval(input: Any): Any =
    NormalizeText.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static entry point shared by interpreted eval and generated code. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NormalizeText].getName, "nfc_normalize"),
    (children: Seq[Expression]) => NormalizeText(children.head))
}
