package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `compression_ratio(text STRING) → DOUBLE`:
  * [[graft.kernel.Compress.ratio]] as a native codegen Catalyst
  * expression — deflate-ratio repetition signal without a boxing UDF,
  * so `WHERE compression_ratio(text) BETWEEN 0.25 AND 1.2` fuses into
  * the same WholeStageCodegen span as the scan it filters.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"compression_ratio requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "compression_ratio"

  protected override def nullSafeEval(input: Any): Any =
    CompressionRatio.of(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CompressionRatio.of($c)")

  override protected def withNewChildInternal(newChild: Expression): CompressionRatio =
    copy(child = newChild)
}

object CompressionRatio {
  /** Static entry point shared by interpreted eval and generated code.
    * UTF8String.getBytes avoids the String round-trip entirely — the
    * kernel's byte path is fed directly.
    */
  def of(text: UTF8String): Double = {
    val raw = text.getBytes
    if (raw.length == 0) 1.0
    else math.rint(graft.kernel.Compress.deflatedSize(raw).toDouble /
      raw.length * 10000.0) / 10000.0
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("compression_ratio"),
    new ExpressionInfo(classOf[CompressionRatio].getName, "compression_ratio"),
    (children: Seq[Expression]) => CompressionRatio(children.head))
}
