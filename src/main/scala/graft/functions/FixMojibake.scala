package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `fix_mojibake(text STRING) → STRING`: windows-1252/latin-1
  * mis-decode repair ([[graft.kernel.Mojibake]]) as a native codegen
  * Catalyst expression — like [[NormalizeText]], a static call from
  * `doGenCode` keeps the hot path inside WholeStageCodegen where a
  * Scala UDF would box rows.
  *
  * Fast path: the kernel's high-char gate means clean ASCII text —
  * the overwhelming majority — pays one scan and returns the INPUT
  * UTF8String zero-copy (no String materialization at all for pure
  * 7-bit input, which the UTF8String byte scan detects first here).
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "fix_mojibake"

  protected override def nullSafeEval(input: Any): Any =
    FixMojibake.fix(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixMojibake.fix($c)")

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

object FixMojibake {
  /** Static entry point shared by interpreted eval and generated code. */
  def fix(text: UTF8String): UTF8String = {
    // 7-bit bytes can never be mojibake: skip even the String decode
    if (isAscii(text)) return text
    val s = text.toString
    val fixed = graft.kernel.Mojibake.repair(s)
    if (fixed eq s) text else UTF8String.fromString(fixed)
  }

  private def isAscii(t: UTF8String): Boolean = {
    val n = t.numBytes()
    var i = 0
    while (i < n) {
      if ((t.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fix_mojibake"),
    new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
    (children: Seq[Expression]) => FixMojibake(children.head))
}
