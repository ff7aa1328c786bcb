package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.kernel.HtmlStream

/** `extract_main_text(html BINARY) → STRING`: the HTML extraction kernel
  * as a native Catalyst scalar expression (SURVEY.md §7 stretch goal).
  *
  * Versus the typed `mapPartitions` stage, this keeps an HTML-branch
  * query fully columnar: no Dataset encoder boundary, and `doGenCode`
  * emits a direct static call so the expression lives *inside*
  * WholeStageCodegen — downstream filters/projections fuse with it into
  * one generated function. The pipeline's flagship path keeps
  * `mapPartitions` (it extracts several fields at once); this expression
  * serves SQL users and text-only projections.
  */
case class ExtractMainText(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"extract_main_text requires BINARY input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "extract_main_text"

  protected override def nullSafeEval(input: Any): Any =
    ExtractMainText.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ExtractMainText.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): ExtractMainText =
    copy(child = newChild)
}

object ExtractMainText {
  /** Static entry point shared by interpreted eval and generated code. */
  def extract(payload: Array[Byte]): UTF8String =
    UTF8String.fromString(HtmlStream.extract(payload).text)

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("extract_main_text"),
    new ExpressionInfo(classOf[ExtractMainText].getName, "extract_main_text"),
    (children: Seq[Expression]) => ExtractMainText(children.head))
}

/** Session extension registering the engine's SQL functions — activate
  * with `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (wired into `Extraction.configure`). After that,
  * `SELECT extract_main_text(html) FROM pages` is a plain SQL query.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(ExtractMainText.registration)
    ext.injectFunction(LangId.registration)
    ext.injectFunction(NormalizeText.registration)
    ext.injectFunction(BpeCount.registration)
    ext.injectFunction(FixMojibake.registration)
    ext.injectFunction(CompressionRatio.registration)
    ext.injectFunction(StripInvisible.registration)
  }
}

object GraftFunctions {
  /** Imperative fallback for sessions built without the extension. */
  def register(spark: SparkSession): Unit =
    Seq(ExtractMainText.registration, LangId.registration,
        NormalizeText.registration, BpeCount.registration,
        FixMojibake.registration, CompressionRatio.registration,
        StripInvisible.registration).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
