package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `strip_invisible(text STRING) → STRING`: remove the invisible and
  * direction-override code points crawl text accumulates — zero-widths
  * (ZWSP/ZWNJ/ZWJ/WJ U+200B–D, U+2060), the bidi control block
  * (U+202A–E embeds/overrides and U+2066–69 isolates — the "trojan
  * source"/URL-spoof characters), BOM-as-text U+FEFF, and soft hyphen
  * U+00AD. These characters break exact dedup (two visually identical
  * pages hash apart), inflate token counts, and smuggle display-order
  * spoofing into training text. Legitimate uses (ZWJ emoji sequences)
  * are rare enough in web prose that corpus pipelines strip uniformly.
  *
  * Native codegen expression like [[NormalizeText]]: a UDF would box
  * and break WholeStageCodegen. Fast path: a clean string (no byte ≥
  * 0xC2 that could start one of the targets) returns the INPUT
  * UTF8String zero-copy — the scan is a byte loop, no decode.
  */
case class StripInvisible(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_invisible requires STRING input, got ${child.dataType.catalogString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_invisible"

  protected override def nullSafeEval(input: Any): Any =
    StripInvisible.strip(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.StripInvisible.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): StripInvisible =
    copy(child = newChild)
}

object StripInvisible {

  /** The stripped set, as code points. */
  def isInvisible(cp: Int): Boolean =
    cp == 0x00AD ||                      // soft hyphen
      (cp >= 0x200B && cp <= 0x200D) ||  // ZWSP, ZWNJ, ZWJ
      cp == 0x2060 ||                    // word joiner
      (cp >= 0x202A && cp <= 0x202E) ||  // bidi embeds/overrides
      (cp >= 0x2066 && cp <= 0x2069) ||  // bidi isolates
      cp == 0xFEFF                       // BOM / deprecated ZWNBSP

  /** Static entry point shared by interpreted eval and generated code. */
  def strip(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    // fast path: every target encodes as UTF-8 starting 0xC2 (U+00AD)
    // or 0xE2/0xEF (U+2xxx/U+FEFF); pure-ASCII-ish strings short-circuit
    var i = 0
    var maybe = false
    while (i < bytes.length && !maybe) {
      val b = bytes(i) & 0xFF
      if (b == 0xC2 || b == 0xE2 || b == 0xEF) maybe = true
      i += 1
    }
    if (!maybe) return text
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var j = 0
    while (j < s.length) {
      val cp = s.codePointAt(j)
      if (!isInvisible(cp)) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    if (sb.length == s.length) text else UTF8String.fromString(sb.toString)
  }

  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("strip_invisible"),
    new ExpressionInfo(classOf[StripInvisible].getName, "strip_invisible"),
    (children: Seq[Expression]) => StripInvisible(children.head))
}
