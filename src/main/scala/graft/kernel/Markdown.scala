package graft.kernel

import graft.kernel.Html.{Element, Node, TextNode}

/** HTML → Markdown (CommonMark-flavored) serializer over the hand-built
  * DOM — the training-data emission format that keeps document
  * STRUCTURE (headings, lists, tables, code, links) that plain
  * extracted text throws away. Many LLM data pipelines feed Markdown
  * rather than flat text for exactly this reason (reference analog: the
  * OCR response's plain-text field, ocr-app `app/services/
  * ocr_service.py`, flattens structure; this is the structured twin).
  *
  * Deterministic by construction: no config, no locale, pure function
  * of the DOM. Renders content-bearing structure and skips only
  * non-content subtrees (script/style/head/template/svg/iframe/form
  * controls); boilerplate REMOVAL is a separate concern
  * ([[Html.extract]]) — a caller wanting "main content as Markdown"
  * composes the two by slicing the DOM first.
  *
  * CommonMark mapping:
  *  - `h1..h6` → ATX headings; `p`/inline runs → paragraphs
  *  - `ul`/`ol` → `-` / `1.` items, nested lists indented under the
  *    parent item, start offset honored via the `start` attribute
  *  - `blockquote` → `> ` prefix per line, nested quotes compose
  *  - `pre` → fenced code block, fence grown past any backtick run in
  *    the payload; `<code class="language-x">` becomes the info string
  *  - `table` → GFM pipe table via the kernel's grid-fill (colspan/
  *    rowspan resolved); first row promoted to header if none
  *  - `a` → `[text](href)`, `img` → `![alt](src)`, `strong`/`b` →
  *    `**`, `em`/`i` → `*`, inline `code` → backtick span, `br` →
  *    hard break (trailing `\`), `hr` → `---`
  *  - Markdown-significant characters in source text are escaped so
  *    the output round-trips: `\ * _ [ ]` inline plus line-leading
  *    `# > + -` and `1.`-style ordinals.
  */
object Markdown {

  def fromHtml(html: String): String = render(Html.parse(html))

  def fromHtml(htmlBytes: Array[Byte]): String =
    fromHtml(CharsetSniff.decode(htmlBytes))

  // tags whose subtrees carry no training text
  private val skipTags = Set("script", "style", "noscript", "template",
    "head", "svg", "iframe", "canvas", "object", "embed", "applet",
    "select", "option", "textarea", "button", "input", "label", "datalist")

  private val headingLevel = Map("h1" -> 1, "h2" -> 2, "h3" -> 3,
    "h4" -> 4, "h5" -> 5, "h6" -> 6)

  // elements rendered as their own block (everything else is inline
  // or a transparent container)
  private val blockTags = Set("p", "div", "section", "article", "aside",
    "header", "footer", "nav", "main", "figure", "figcaption", "address",
    "ul", "ol", "li", "table", "blockquote", "pre", "hr", "dl", "dt",
    "dd", "form", "fieldset", "details", "summary", "body", "html",
    "#root") ++ headingLevel.keySet

  private def isBlock(n: Node): Boolean = n match {
    case Element(name, _, _) => blockTags(name)
    case _                   => false
  }

  /** Escape characters that would be re-parsed as Markdown syntax. */
  private[kernel] def escapeInline(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' || c == '*' || c == '_' || c == '[' || c == ']' || c == '`')
        sb.append('\\')
      sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Escape a line start that CommonMark would read as block syntax. */
  private def escapeLineStart(line: String): String = {
    val t = line.dropWhile(_ == ' ')
    val pad = line.length - t.length
    val needs =
      t.startsWith("#") || t.startsWith(">") ||
        ((t.startsWith("- ") || t.startsWith("+ ")) || t == "-" || t == "+") ||
        t.matches("""\d{1,9}[.)] .*""") ||
        t.matches("""(-{3,}|={3,}|_{3,}|\*{3,})\s*""")
    if (needs) line.substring(0, pad) + "\\" + t else line
  }

  private def collapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var ws = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\u00a0') ws = true
      else {
        if (ws && sb.length > 0) sb.append(' ')
        ws = false
        sb.append(c)
      }
      i += 1
    }
    // NOTE: trailing whitespace dropped, leading collapsed away; the
    // caller re-inserts a boundary space via `wsBefore` bookkeeping
    sb.toString
  }

  // ------------------------------------------------------------- inline
  /** Render an inline run into `sb`. The `HardBreak` sentinel marks
    * `<br>` positions; paragraph assembly resolves it to a CommonMark
    * hard break (trailing backslash + newline).
    */
  private val HardBreak = '\u0000'

  private def inline(n: Node, sb: java.lang.StringBuilder): Unit = n match {
    case TextNode(t) =>
      val c = collapse(t)
      if (c.nonEmpty) {
        // preserve ONE boundary space on each side; paragraph assembly
        // trims run edges, so a leading space at run start is harmless
        // and lets an enclosing emphasis/link see its flanking ws
        if ((t.charAt(0).isWhitespace || t.charAt(0) == '\u00a0') &&
          (sb.length == 0 || sb.charAt(sb.length - 1) != ' ')) sb.append(' ')
        sb.append(escapeInline(c))
        if (t.charAt(t.length - 1).isWhitespace ||
          t.charAt(t.length - 1) == '\u00a0') sb.append(' ')
      }
    case e @ Element(name, attrs, children) =>
      name match {
        case t if skipTags(t) => ()
        case "br" => sb.append(HardBreak)
        case "img" =>
          val alt = collapse(attrs.getOrElse("alt", ""))
          val src = attrs.getOrElse("src", "").trim
          if (src.nonEmpty || alt.nonEmpty)
            sb.append('!').append('[').append(escapeInline(alt)).append("](")
              .append(src.replace("(", "%28").replace(")", "%29")).append(')')
        case "a" =>
          val inner = inlineChildren(children)
          val href = attrs.getOrElse("href", "").trim
          val usable = href.nonEmpty && !href.toLowerCase.startsWith("javascript:")
          val core = inner.trim
          if (core.nonEmpty && usable) {
            if (inner.head.isWhitespace &&
              (sb.length == 0 || sb.charAt(sb.length - 1) != ' ')) sb.append(' ')
            sb.append('[').append(core).append("](")
              .append(href.replace("(", "%28").replace(")", "%29")).append(')')
            if (inner.last.isWhitespace) sb.append(' ')
          } else if (inner.nonEmpty) sb.append(inner)
        case "strong" | "b" => emphasis(children, sb, "**")
        case "em" | "i"     => emphasis(children, sb, "*")
        case "del" | "s" | "strike" => emphasis(children, sb, "~~")
        case "code" | "kbd" | "samp" =>
          val raw = rawText(e)
          val t = collapse(raw)
          if (t.nonEmpty) {
            // fence longer than any backtick run inside
            var run = 0; var maxRun = 0
            t.foreach { c => if (c == '`') { run += 1; maxRun = math.max(maxRun, run) } else run = 0 }
            val fence = "`" * (maxRun + 1)
            val pad = if (t.startsWith("`") || t.endsWith("`")) " " else ""
            sb.append(fence).append(pad).append(t).append(pad).append(fence)
          }
        case _ => children.foreach(inline(_, sb)) // transparent span/u/small/…
      }
  }

  private def emphasis(children: scala.collection.Seq[Node],
                       sb: java.lang.StringBuilder, mark: String): Unit = {
    val inner = inlineChildren(children)
    if (inner.nonEmpty) {
      // CommonMark delimiters don't tolerate flanking whitespace
      val core = inner.trim
      if (core.nonEmpty) {
        if (sb.length > 0 && !sb.charAt(sb.length - 1).isWhitespace &&
          inner.head.isWhitespace) sb.append(' ')
        sb.append(mark).append(core).append(mark)
        if (inner.last.isWhitespace) sb.append(' ')
      }
    }
  }

  private def inlineChildren(children: scala.collection.Seq[Node]): String = {
    val sb = new java.lang.StringBuilder
    children.foreach(inline(_, sb))
    sb.toString
  }

  /** Raw (uncollapsed, unescaped) text of a subtree, skipping
    * non-content tags — the `pre`/`code` payload reader.
    */
  private def rawText(e: Element): String = {
    val sb = new java.lang.StringBuilder
    def walk(n: Node): Unit = n match {
      case TextNode(t) => sb.append(t)
      case Element(name, _, _) if skipTags(name) => ()
      case Element("br", _, _) => sb.append('\n')
      case Element(_, _, cs) => cs.foreach(walk)
    }
    e.children.foreach(walk)
    sb.toString
  }

  // ------------------------------------------------------------- blocks
  /** Render an element's children as a sequence of finished Markdown
    * blocks (each internally newline-joined, no trailing newline).
    * Consecutive inline nodes coalesce into one paragraph block.
    */
  private def childBlocks(children: scala.collection.Seq[Node]): Vector[String] = {
    val out = Vector.newBuilder[String]
    val run = scala.collection.mutable.ArrayBuffer.empty[Node]
    def flushRun(): Unit = {
      if (run.nonEmpty) {
        val p = paragraph(run.toSeq)
        if (p.nonEmpty) out += p
        run.clear()
      }
    }
    children.foreach {
      case e: Element if isBlock(e) => flushRun(); out ++= blockOf(e)
      case n                        => run += n
    }
    flushRun()
    out.result()
  }

  /** Assemble one paragraph from an inline run: collapse, resolve hard
    * breaks, escape line starts.
    */
  private def paragraph(nodes: scala.collection.Seq[Node]): String = {
    val sb = new java.lang.StringBuilder
    nodes.foreach(inline(_, sb))
    val lines = sb.toString.split(HardBreak.toString, -1).map(s => collapseEdges(s))
    // drop empty segments at the edges, keep interior ones (a <br><br>
    // in source is a visible blank)
    val trimmed = lines.dropWhile(_.isEmpty).reverse.dropWhile(_.isEmpty).reverse
    if (trimmed.isEmpty) ""
    else trimmed.map(escapeLineStart).mkString("\\\n")
  }

  private def collapseEdges(s: String): String = {
    var a = 0; var b = s.length
    while (a < b && s.charAt(a).isWhitespace) a += 1
    while (b > a && s.charAt(b - 1).isWhitespace) b -= 1
    s.substring(a, b)
  }

  /** Blocks produced by one block-level element. */
  private def blockOf(e: Element): Vector[String] = e.name match {
    case t if skipTags(t) => Vector.empty
    case "hr" => Vector("---")
    case h if headingLevel.contains(h) =>
      val txt = collapseEdges(inlineChildren(e.children).replace(HardBreak, ' '))
      if (txt.isEmpty) Vector.empty
      else Vector(("#" * headingLevel(h)) + " " + txt)
    case "p" | "dt" | "figcaption" | "summary" | "address" =>
      val p = paragraph(e.children.toSeq)
      if (p.isEmpty) Vector.empty else Vector(p)
    case "dd" =>
      childBlocks(e.children).map(b => prefixLines(b, ": ", "  "))
    case "blockquote" =>
      val inner = childBlocks(e.children)
      if (inner.isEmpty) Vector.empty
      else Vector(inner.mkString("\n\n").linesIterator
        .map(l => if (l.isEmpty) ">" else "> " + l).mkString("\n"))
    case "pre" =>
      val (payload, info) = e.children.toSeq match {
        case Seq(c @ Element("code", attrs, _)) =>
          val lang = attrs.getOrElse("class", "").split("\\s+")
            .collectFirst { case cl if cl.startsWith("language-") => cl.stripPrefix("language-") }
          (rawText(c), lang.getOrElse(""))
        case _ => (rawText(e), "")
      }
      val body = payload.replace("\r\n", "\n").replace("\r", "\n")
        .stripPrefix("\n").reverse.dropWhile(_ == '\n').reverse
      var run = 0; var maxRun = 2
      body.foreach { c => if (c == '`') { run += 1; maxRun = math.max(maxRun, run) } else run = 0 }
      val fence = "`" * (maxRun + 1)
      Vector(fence + info + "\n" + body + "\n" + fence)
    case "ul" | "ol" => Vector(list(e))
    case "li" => // stray li outside a list: render as ul item
      Vector(listItem(e, "- "))
    case "table" => table(e)
    case _ => // transparent container: div/section/article/dl/body/…
      childBlocks(e.children)
  }

  private def prefixLines(block: String, first: String, rest: String): String = {
    val it = block.linesIterator
    val out = new java.lang.StringBuilder
    var n = 0
    it.foreach { l =>
      if (n > 0) out.append('\n')
      val p = if (n == 0) first else rest
      out.append(if (l.isEmpty) p.replaceAll("\\s+$", "") else p + l)
      n += 1
    }
    out.toString
  }

  private def listItem(li: Element, bullet: String): String = {
    val inner = childBlocks(li.children)
    val cont = " " * bullet.length
    if (inner.isEmpty) bullet.trim
    else prefixLines(inner.mkString("\n\n"), bullet, cont)
  }

  private def list(e: Element): String = {
    val ordered = e.name == "ol"
    val start = e.attrs.get("start").flatMap(_.trim.toIntOption).getOrElse(1)
    val items = e.children.collect { case li @ Element("li", _, _) => li }
    var idx = start
    val rendered = items.map { li =>
      val bullet = if (ordered) s"$idx. " else "- "
      idx += 1
      listItem(li, bullet)
    }
    rendered.mkString("\n")
  }

  private def pipeEscape(s: String): String =
    escapeInline(s).replace("|", "\\|")

  private def table(e: Element): Vector[String] = {
    // reuse the grid-fill (colspan/rowspan) reader; nested tables are
    // emitted by their own visit, so only take the outermost here
    val t = Html.gridFillTable(e)
    val all = (if (t.headers.nonEmpty) Vector(t.headers) else Vector.empty) ++ t.rows
    if (all.isEmpty) return if (t.caption.nonEmpty) Vector(escapeInline(t.caption)) else Vector.empty
    val width = all.map(_.size).max
    def row(cells: Vector[String]): String =
      "| " + cells.padTo(width, "").map(c => pipeEscape(collapse(c))).mkString(" | ") + " |"
    val header = row(all.head)
    val sep = "| " + Vector.fill(width)("---").mkString(" | ") + " |"
    val body = all.tail.map(row)
    val tbl = (header +: sep +: body).mkString("\n")
    if (t.caption.nonEmpty) Vector(escapeInline(t.caption), tbl) else Vector(tbl)
  }

  private def render(root: Element): String =
    childBlocks(root.children).mkString("\n\n")
}
