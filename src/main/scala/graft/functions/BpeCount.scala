package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.Bpe

/** `bpe_count(text STRING) → INT`: the REAL byte-level BPE subword count
  * ([[graft.kernel.Bpe]] — merges table actually applied, unlike the
  * `TextOps.bpeTokenCount` pretoken proxy, which counts 1 per pretoken
  * regardless of vocabulary). Like [[LangId]], `doGenCode` emits a direct
  * static call so the kernel runs inside WholeStageCodegen; a Scala UDF
  * would box per row and break the codegen span.
  */
case class BpeCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_count requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  protected override def nullSafeEval(input: Any): Any =
    BpeCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  /** Static entry point shared by interpreted eval and generated code. */
  def count(text: UTF8String): Int = Bpe.countTokens(text.toString)

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bpe_count"),
    new ExpressionInfo(classOf[BpeCount].getName, "bpe_count"),
    (children: Seq[Expression]) => BpeCount(children.head))
}
