package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.Lang

/** `lang_id(text STRING) → STRING`: the zero-allocation stopword
  * language identifier ([[graft.kernel.Lang.detect]]) as a native
  * Catalyst scalar expression.
  *
  * The columnar formulation ([[graft.ops.TextOps.langId]]) is built from
  * higher-order array functions, which are CodegenFallback — interpreted
  * and boxed per token. This expression emits a direct static call from
  * `doGenCode`, so it runs the packed-table kernel INSIDE
  * WholeStageCodegen and fuses with surrounding filters/projections —
  * the columnar speed of a built-in with kernel semantics (both paths
  * differential-tested equal in OpsSpec/FunctionsSpec).
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lang_id requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  protected override def nullSafeEval(input: Any): Any =
    LangId.detect(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangId.detect($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

object LangId {
  /** Static entry point shared by interpreted eval and generated code. */
  def detect(text: UTF8String): UTF8String =
    UTF8String.fromString(Lang.detect(text.toString))

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("lang_id"),
    new ExpressionInfo(classOf[LangId].getName, "lang_id"),
    (children: Seq[Expression]) => LangId(children.head))
}
