package graft.kernel

import scala.collection.mutable.{ArrayBuffer, ListBuffer}

/** Hand-built HTML extraction kernel: tokenizer → DOM builder → block
  * segmentation → text-density / link-density boilerplate classifier →
  * main-content text.
  *
  * Re-implements, Spark-side and from scratch, the semantics of the
  * reference's full-document text+label analysis branch
  * (`/root/reference/app/services/vision_service.py:26-159`): input is a
  * raw document payload, output is `{text, labels[], metadata{document_type,
  * language, confidence}}`. The reference delegates to an external vision
  * API; per the north rule we re-express it as a deterministic hand-built
  * HTML tokenizer + DOM tree + Boilerpipe-style block scoring
  * (NumWordsRulesClassifier thresholds from the published Boilerpipe
  * algorithm, Kohlschütter et al., WSDM 2010).
  *
  * === Normalization spec (FROZEN — byte-identity contract) ===
  *  - Input bytes are decoded as UTF-8.
  *  - Entity decode: named {amp,lt,gt,quot,apos,nbsp} + numeric dec/hex.
  *    `&nbsp;` → U+00A0, which the whitespace collapse then folds to ' '.
  *  - Whitespace collapse: every maximal run of Unicode whitespace
  *    (incl. U+00A0) inside a block becomes a single ASCII space; blocks
  *    are trimmed.
  *  - Content blocks are joined with a single '\n'; no trailing newline.
  *  - script/style contents are dropped; title is captured, not emitted.
  *  - Blocks with a nav/header/footer/aside ancestor are always
  *    boilerplate (trafilatura-style structural prior).
  */
object Html {

  // ---------------------------------------------------------------- tokens
  sealed trait Tok
  final case class TStart(name: String, attrs: Map[String, String], selfClosing: Boolean) extends Tok
  final case class TEnd(name: String) extends Tok
  final case class TText(text: String) extends Tok // entity-decoded

  private[kernel] val rawTextTags = Set("script", "style", "textarea", "title")

  private[kernel] val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> "\u00a0")

  /** Decode HTML entities; unknown entities are left verbatim. */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = s.substring(i + 1, semi)
          val rep =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            } else namedEntities.get(body)
          rep match {
            case Some(r) => sb.append(r); i = semi + 1
            case None    => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Tokenize an HTML string. Handles doctype, comments, CDATA, raw-text
    * elements (script/style/textarea/title), quoted/unquoted attributes,
    * self-closing tags, entities, and malformed stray '<'.
    */
  def tokenize(html: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = html.length
    var i = 0
    val text = new java.lang.StringBuilder

    def flushText(): Unit =
      if (text.length > 0) { out += TText(decodeEntities(text.toString)); text.setLength(0) }

    def lowerAt(idx: Int, lit: String): Boolean =
      idx + lit.length <= n && html.regionMatches(true, idx, lit, 0, lit.length)

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          flushText()
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lowerAt(i, "<![cdata[")) {
          flushText()
          val end = html.indexOf("]]>", i + 9)
          val body = html.substring(i + 9, if (end < 0) n else end)
          if (body.nonEmpty) out += TText(body) // CDATA: no entity decode
          i = if (end < 0) n else end + 3
        } else if (lowerAt(i, "<!") || lowerAt(i, "<?")) { // doctype / PI
          flushText()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
          flushText()
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // attributes
          val attrs = Map.newBuilder[String, String]
          var selfClosing = false
          var done = false
          while (!done && j < n) {
            while (j < n && html.charAt(j).isWhitespace) j += 1
            if (j < n && html.charAt(j) == '>') { j += 1; done = true }
            else if (j + 1 < n && html.charAt(j) == '/' && html.charAt(j + 1) == '>') {
              selfClosing = true; j += 2; done = true
            } else if (j >= n) { done = true }
            else {
              val aStart = j
              while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '=' &&
                     html.charAt(j) != '>' && html.charAt(j) != '/') j += 1
              if (aStart == j && (j >= n || html.charAt(j) != '=')) {
                // a bare '/' not followed by '>' yields an empty name and
                // no '=' — skip one char or the scan makes no progress
                // (hang on inputs like `<a x/y>`)
                j += 1
              } else {
                val aName = html.substring(aStart, j).toLowerCase
                while (j < n && html.charAt(j).isWhitespace) j += 1
                var aVal = ""
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && html.charAt(j).isWhitespace) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); j += 1
                    val vStart = j
                    while (j < n && html.charAt(j) != q) j += 1
                    aVal = html.substring(vStart, j)
                    if (j < n) j += 1
                  } else {
                    val vStart = j
                    while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                    aVal = html.substring(vStart, j)
                  }
                }
                if (aName.nonEmpty) attrs += aName -> decodeEntities(aVal)
              }
            }
          }
          if (closing) out += TEnd(name)
          else {
            out += TStart(name, attrs.result(), selfClosing)
            if (!selfClosing && rawTextTags(name)) {
              // raw-text mode: scan to the matching close tag, verbatim
              val close = "</" + name
              var k = html.indexOf(close, j)
              // close must be followed by '>' or whitespace per spec
              while (k >= 0 && k + close.length < n && {
                val ch = html.charAt(k + close.length); !(ch == '>' || ch.isWhitespace)
              }) k = html.indexOf(close, k + 1)
              val body = html.substring(j, if (k < 0) n else k)
              if (name == "title" || name == "textarea") {
                if (body.nonEmpty) out += TText(decodeEntities(body))
              } // script/style bodies are dropped entirely
              if (k < 0) { i = n; out += TEnd(name) }
              else {
                val gt = html.indexOf('>', k)
                i = if (gt < 0) n else gt + 1
                out += TEnd(name)
              }
              j = i
            }
          }
          i = j
        } else { text.append(c); i += 1 } // stray '<'
      } else { text.append(c); i += 1 }
    }
    flushText()
    out.result()
  }

  // ------------------------------------------------------------------- DOM
  sealed trait Node
  final case class Element(name: String, attrs: Map[String, String],
                           children: ArrayBuffer[Node]) extends Node
  final case class TextNode(text: String) extends Node

  private[kernel] val voidTags = Set("area", "base", "br", "col", "embed", "hr", "img",
    "input", "link", "meta", "param", "source", "track", "wbr")

  /** Tags that implicitly close an open <p>. */
  private[kernel] val pClosers = Set("p", "div", "ul", "ol", "li", "table", "blockquote",
    "pre", "h1", "h2", "h3", "h4", "h5", "h6", "section", "article", "aside",
    "header", "footer", "nav", "main", "figure", "form", "hr", "dl")

  /** Build a DOM tree with a simple insertion-mode stack: void elements are
    * never pushed; <p>/<li>/<td>/<tr>/<dt>/<dd> close their implied
    * predecessors; unmatched end tags are ignored; unclosed tags close at
    * the nearest matching open ancestor (or EOF).
    */
  def parse(html: String): Element = {
    val root = Element("#root", Map.empty, ArrayBuffer.empty)
    val stack = ListBuffer[Element](root)
    def top = stack.head
    def open(e: Element): Unit = { top.children += e; stack.prepend(e) }
    def closeImplied(name: String): Unit = {
      name match {
        case t if pClosers(t) =>
          if (stack.exists(_.name == "p")) while (stack.head.name != "p") stack.remove(0)
          if (stack.head.name == "p") stack.remove(0)
        case _ =>
      }
      name match {
        case "li" =>
          val idx = stack.indexWhere(e => e.name == "li" || e.name == "ul" || e.name == "ol")
          if (idx >= 0 && stack(idx).name == "li") (0 to idx).foreach(_ => stack.remove(0))
        case "td" | "th" =>
          val idx = stack.indexWhere(e => e.name == "td" || e.name == "th" || e.name == "tr" || e.name == "table")
          if (idx >= 0 && (stack(idx).name == "td" || stack(idx).name == "th"))
            (0 to idx).foreach(_ => stack.remove(0))
        case "tr" =>
          val idx = stack.indexWhere(e => e.name == "tr" || e.name == "table")
          if (idx >= 0 && stack(idx).name == "tr") (0 to idx).foreach(_ => stack.remove(0))
        case "dt" | "dd" =>
          val idx = stack.indexWhere(e => e.name == "dt" || e.name == "dd" || e.name == "dl")
          if (idx >= 0 && (stack(idx).name == "dt" || stack(idx).name == "dd"))
            (0 to idx).foreach(_ => stack.remove(0))
        case _ =>
      }
    }
    tokenize(html).foreach {
      case TStart(name, attrs, selfClosing) =>
        closeImplied(name)
        val e = Element(name, attrs, ArrayBuffer.empty)
        if (voidTags(name) || selfClosing) top.children += e
        else open(e)
      case TEnd(name) =>
        if (!voidTags(name)) {
          val idx = stack.indexWhere(_.name == name)
          if (idx >= 0 && stack(idx).name != "#root")
            (0 to idx).foreach(_ => stack.remove(0))
          // unmatched end tag: ignore
        }
      case TText(t) =>
        if (t.nonEmpty) top.children += TextNode(t)
    }
    root
  }

  // ------------------------------------------------------------ segmentation
  /** One text block: the classifier's unit. */
  final case class Block(text: String, words: Int, anchorChars: Int, chars: Int,
                         headingLevel: Int, inBoilerTag: Boolean) {
    def linkDensity: Double = if (chars == 0) 0.0 else anchorChars.toDouble / chars
  }

  private[kernel] val blockTags = Set("html", "body", "div", "p", "h1", "h2", "h3", "h4",
    "h5", "h6", "ul", "ol", "li", "table", "thead", "tbody", "tr", "td", "th",
    "blockquote", "pre", "article", "section", "header", "footer", "nav",
    "aside", "main", "figure", "figcaption", "dl", "dt", "dd", "form",
    "fieldset", "address", "center", "caption")

  private[kernel] val boilerAncestors = Set("nav", "header", "footer", "aside")

  /** Collapse whitespace runs (incl. NBSP) to single spaces and trim. */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace || c == '\u00A0') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def countWords(s: String): Int = if (s.isEmpty) 0 else {
    var cnt = 1; var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') cnt += 1; i += 1 }
    cnt
  }

  final case class Segmented(title: String, blocks: Vector[Block], headings: Vector[String])

  /** DFS the DOM emitting one Block per contiguous inline-text run; block
    * boundaries at every block-level element open/close.
    */
  def segment(root: Element): Segmented = {
    val blocks = Vector.newBuilder[Block]
    val headings = Vector.newBuilder[String]
    var title = ""
    val raw = new java.lang.StringBuilder
    var anchorChars = 0
    var anchorDepth = 0
    var headingLevel = 0
    var boilerDepth = 0

    def flush(): Unit = {
      val txt = collapseWs(raw.toString)
      if (txt.nonEmpty) {
        val b = Block(txt, countWords(txt), math.min(anchorChars, txt.length),
          txt.length, headingLevel, boilerDepth > 0)
        blocks += b
        if (headingLevel > 0) headings += txt
      }
      raw.setLength(0); anchorChars = 0
    }

    // explicit-stack walk — recursion here overflowed the JVM stack near
    // depth 1000 (real crawls nest pathologically; the hostile golden set
    // pins a 1000-deep document)
    final case class Exit(isBlock: Boolean, isHeading: Boolean,
                          isBoiler: Boolean, isAnchor: Boolean)
    val work = new scala.collection.mutable.ArrayBuffer[AnyRef](64)
    work += root
    while (work.nonEmpty) {
      val item = work.remove(work.length - 1)
      item match {
        case TextNode(t) =>
          raw.append(t)
          if (anchorDepth > 0) anchorChars += collapseWs(t).length
        case e: Element =>
          e.name match {
            case "title" =>
              if (title.isEmpty)
                title = collapseWs(e.children.collect { case TextNode(t) => t }.mkString)
            case "script" | "style" | "textarea" => // dropped
            case "br" => raw.append(' ')
            case name =>
              val isBlock = blockTags(name)
              val isHeading = name.length == 2 && name.charAt(0) == 'h' && name.charAt(1).isDigit
              val isBoiler = boilerAncestors(name)
              val isAnchor = name == "a"
              if (isBlock) flush()
              if (isHeading) headingLevel = name.charAt(1) - '0'
              if (isBoiler) boilerDepth += 1
              if (isAnchor) anchorDepth += 1
              work += Exit(isBlock, isHeading, isBoiler, isAnchor)
              var i = e.children.length - 1
              while (i >= 0) { work += e.children(i); i -= 1 }
          }
        case Exit(isBlock, isHeading, isBoiler, isAnchor) =>
          if (isAnchor) anchorDepth -= 1
          if (isBlock) flush()
          if (isHeading) headingLevel = 0
          if (isBoiler) boilerDepth -= 1
        case _ =>
      }
    }
    flush()
    Segmented(title, blocks.result(), headings.result())
  }

  // ------------------------------------------------------------- classifier
  /** Boilerpipe NumWordsRulesClassifier (published decision-tree thresholds)
    * + structural prior: blocks under nav/header/footer/aside are always
    * boilerplate. prev/next are the neighboring blocks (empty sentinels at
    * the edges).
    */
  def isContent(prev: Block, curr: Block, next: Block): Boolean = {
    if (curr.inBoilerTag) false
    else if (curr.linkDensity > 0.333333) false
    else if (prev.linkDensity <= 0.555556)
      curr.words > 16 || next.words > 15 || prev.words > 4
    else
      curr.words > 40 || next.words > 17
  }

  private[kernel] val emptyBlock = Block("", 0, 0, 0, 0, inBoilerTag = false)

  final case class Extraction(title: String, text: String,
                              headings: Vector[String],
                              contentBlocks: Int, boilerBlocks: Int,
                              language: String)

  /** Block-window classification shared by the DOM and streaming paths. */
  private[kernel] def classify(seg: Segmented): Extraction = {
    val bs = seg.blocks
    val content = Vector.newBuilder[String]
    var nContent = 0
    var nBoiler = 0
    var i = 0
    while (i < bs.length) {
      val prev = if (i == 0) emptyBlock else bs(i - 1)
      val next = if (i == bs.length - 1) emptyBlock else bs(i + 1)
      if (isContent(prev, bs(i), next)) { content += bs(i).text; nContent += 1 }
      else nBoiler += 1
      i += 1
    }
    val text = content.result().mkString("\n")
    Extraction(seg.title, text, seg.headings, nContent, nBoiler, Lang.detect(text))
  }

  /** Full kernel: bytes → extracted main text + labels + language.
    * Delegates to [[HtmlStream]], the allocation-light single-pass
    * implementation; [[extractDom]] is the reference tokenizer→DOM→segment
    * path, kept as the executable spec the streaming path is
    * differential-tested against.
    */
  def extract(htmlBytes: Array[Byte]): Extraction =
    extract(CharsetSniff.decode(htmlBytes))

  def extract(html: String): Extraction = HtmlStream.extract(html)

  def extractDom(html: String): Extraction = classify(segment(parse(html)))

  /** Outlinks of a page: every `<a href>` value, resolved against the
    * page url when relative — the edge list feeding host-graph
    * analytics (link-based quality/authority, crawl frontier stats).
    * Fragments are dropped; `javascript:`/`mailto:`/`data:`/`tel:`
    * pseudo-links are skipped; resolution handles protocol-relative
    * (`//host/x`), root-relative (`/x`) and path-relative (`x`, `../x`)
    * forms via `java.net.URI` semantics with a manual fallback for
    * hrefs URI rejects (real crawls carry unencoded spaces etc).
    */
  def extractLinks(htmlBytes: Array[Byte], pageUrl: String): Vector[String] =
    extractLinks(CharsetSniff.decode(htmlBytes), pageUrl)

  /** Resolve one raw href against the page url per the
    * [[extractLinks]] rules; None for pseudo-links, fragments-only and
    * unresolvable relatives.
    */
  private def resolveHref(pageUrl: String, href0: String): Option[String] = {
    val href = {
      val h = href0.trim
      val f = h.indexOf('#')
      if (f >= 0) h.substring(0, f) else h
    }
    val lower = href.toLowerCase
    val pseudo = lower.startsWith("javascript:") || lower.startsWith("mailto:") ||
      lower.startsWith("data:") || lower.startsWith("tel:")
    if (href.isEmpty || pseudo) None
    else
      try {
        val u = new java.net.URI(pageUrl).resolve(new java.net.URI(href))
        if (u.isAbsolute) Some(u.toString) else None
      } catch {
        case _: Exception =>
          // crawl reality: hrefs URI refuses (spaces, bad escapes)
          if (lower.startsWith("http://") || lower.startsWith("https://")) Some(href)
          else None
      }
  }

  def extractLinks(html: String, pageUrl: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    tokenize(html).foreach {
      case TStart("a", attrs, _) =>
        attrs.get("href").foreach(h => resolveHref(pageUrl, h).foreach(out += _))
      case _ =>
    }
    out.result()
  }

  /** Outlinks WITH their anchor text — the link-description signal
    * anchor-text aggregation feeds on (per-target anchor terms are the
    * classic external summary of a page, weighted heavily by web IR
    * since before PageRank). One tokenizer pass: text tokens between
    * an `<a href>` and its `</a>` (or the next `<a>` — anchors do not
    * nest per WHATWG) collapse to one whitespace-normalized string.
    */
  def extractAnchors(htmlBytes: Array[Byte], pageUrl: String): Vector[(String, String)] =
    extractAnchors(CharsetSniff.decode(htmlBytes), pageUrl)

  def extractAnchors(html: String, pageUrl: String): Vector[(String, String)] = {
    val out = Vector.newBuilder[(String, String)]
    var current: String = null // resolved href of the open anchor
    val text = new java.lang.StringBuilder
    def close(): Unit = {
      if (current != null) {
        out += ((current, text.toString.replaceAll("\\s+", " ").trim))
        current = null
      }
      text.setLength(0)
    }
    tokenize(html).foreach {
      case TStart("a", attrs, _) =>
        close() // anchors do not nest: a new <a> implies </a>
        attrs.get("href").flatMap(h => resolveHref(pageUrl, h))
          .foreach(r => current = r)
      case TEnd("a") => close()
      case TText(t) if current != null => text.append(t)
      case _ =>
    }
    close() // unclosed trailing anchor
    out.result()
  }

  // ------------------------------------------------------------ tables

  final case class HtmlTable(caption: String, headers: Vector[String],
                             rows: Vector[Vector[String]])

  /** Subtree text for one cell: collapsed, entity-decoded, EXCLUDING
    * nested tables (each nested table is extracted as its own
    * [[HtmlTable]]) and script/style payloads.
    */
  private def cellText(e: Element): String = {
    val sb = new java.lang.StringBuilder()
    def walk(n: Node): Unit = n match {
      case Element("table" | "script" | "style", _, _) => ()
      case Element(_, _, cs) => cs.foreach(walk)
      case TextNode(t) => sb.append(t).append(' ')
    }
    e.children.foreach(walk)
    collapseWs(sb.toString)
  }

  /** Every `<table>` (nested ones included, innermost extracted
    * separately) as rows of cell texts with the HTML table model
    * honored: `colspan` duplicates a value across columns, `rowspan`
    * carries it down through subsequent rows (the standard grid-fill
    * algorithm), `<caption>` captured, `headers` = the cells of the
    * first all-`<th>` row. Structured tables are training-data gold
    * (tables → records); the boilerplate classifier deliberately
    * down-weights them, so this is the complementary reader.
    */
  def extractTables(html: String): Vector[HtmlTable] =
    extractTables(parse(html))

  def extractTables(htmlBytes: Array[Byte]): Vector[HtmlTable] =
    extractTables(CharsetSniff.decode(htmlBytes))

  private def extractTables(root: Element): Vector[HtmlTable] = {
    val out = Vector.newBuilder[HtmlTable]
    def findTables(n: Node): Unit = n match {
      case e @ Element("table", _, _) =>
        out += gridFillTable(e)
        e.children.foreach(findTables) // nested tables too
      case Element(_, _, cs) => cs.foreach(findTables)
      case _ => ()
    }
    findTables(root)
    out.result()
  }

  private def intAttr(e: Element, a: String, dflt: Int): Int =
    e.attrs.get(a).flatMap(_.trim.toIntOption).filter(_ >= 1).getOrElse(dflt)

  private[kernel] def gridFillTable(table: Element): HtmlTable = {
    var caption = ""
    val trs = Vector.newBuilder[Element]
    def collect(n: Node, depth: Int): Unit = n match {
      case Element("table", _, _) if depth > 0 => () // nested: its own table
      case e @ Element("caption", _, _) => if (caption.isEmpty) caption = cellText(e)
      case e @ Element("tr", _, _) => trs += e
      case Element(_, _, cs) => cs.foreach(collect(_, depth + 1))
      case _ => ()
    }
    table.children.foreach(collect(_, 1))
    // grid fill: pending(col) = (remainingRows, value) from rowspans above
    val pending = scala.collection.mutable.Map.empty[Int, (Int, String)]
    val rows = Vector.newBuilder[Vector[String]]
    var nRows = 0
    var headers = Vector.empty[String]
    trs.result().foreach { tr =>
      val cells = tr.children.collect {
        case e @ Element("td" | "th", _, _) => e
      }
      val row = scala.collection.mutable.ArrayBuffer.empty[String]
      var col = 0
      def drainPending(): Unit =
        while (pending.contains(col)) {
          val (left, v) = pending(col)
          row += v
          if (left <= 1) pending.remove(col) else pending(col) = (left - 1, v)
          col += 1
        }
      cells.foreach { c =>
        drainPending()
        val txt = cellText(c)
        val cspan = math.min(intAttr(c, "colspan", 1), 1000)
        val rspan = math.min(intAttr(c, "rowspan", 1), 65534)
        (0 until cspan).foreach { _ =>
          row += txt
          if (rspan > 1) pending(col) = (rspan - 1, txt)
          col += 1
        }
      }
      drainPending()
      val vrow = row.toVector
      if (vrow.nonEmpty) {
        if (headers.isEmpty && nRows == 0 &&
          cells.nonEmpty && cells.forall(_.name == "th")) headers = vrow
        else { rows += vrow; nRows += 1 }
      }
    }
    HtmlTable(caption, headers, rows.result())
  }

  // ----------------------------------------------------- head metadata

  final case class HeadMeta(title: String, canonical: String,
                            meta: Map[String, String], jsonLd: Vector[String])

  /** Structured page metadata for corpus curation: `<meta name=…>` and
    * `<meta property=…>` content (OpenGraph/Twitter/description…,
    * first value wins per key), `<link rel=canonical>`, and raw
    * JSON-LD payloads (`<script type="application/ld+json">` — kept
    * verbatim; schema interpretation is downstream's concern). Token
    * stream only, no DOM build — head metadata never nests.
    */
  def extractMetadata(html: String): HeadMeta = {
    var title = ""
    var canonical = ""
    val meta = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var inTitle = false
    val titleSb = new java.lang.StringBuilder()
    tokenize(html).foreach {
      case TStart("title", _, _) => inTitle = title.isEmpty
      case TEnd("title") =>
        if (inTitle) { title = collapseWs(titleSb.toString); inTitle = false }
      case TStart("meta", attrs, _) =>
        val key = attrs.get("name").orElse(attrs.get("property")).map(_.trim.toLowerCase)
        (key, attrs.get("content")) match {
          case (Some(k), Some(v)) if k.nonEmpty => meta.getOrElseUpdate(k, v.trim)
          case _ => ()
        }
      case TStart("link", attrs, _) =>
        if (canonical.isEmpty &&
          attrs.get("rel").exists(_.trim.equalsIgnoreCase("canonical")))
          canonical = attrs.getOrElse("href", "").trim
      case TText(t) =>
        if (inTitle) titleSb.append(t)
      case _ => ()
    }
    // JSON-LD: the tokenizer DROPS script bodies by design (the
    // extraction hot path never wants them), so ld+json payloads come
    // from a dedicated raw scan over the source
    val jsonLd = Vector.newBuilder[String]
    var i = 0
    val lower = html.toLowerCase
    while (i >= 0 && i < html.length) {
      i = lower.indexOf("<script", i)
      if (i >= 0) {
        val gt = html.indexOf('>', i)
        if (gt < 0) i = -1
        else {
          val attrsRegion = lower.substring(i, gt)
          val isLd = attrsRegion.contains("application/ld+json")
          val end = lower.indexOf("</script", gt + 1)
          if (isLd) {
            val body = html.substring(gt + 1, if (end < 0) html.length else end).trim
            if (body.nonEmpty) jsonLd += body
          }
          i = if (end < 0) -1 else end + 1
        }
      }
    }
    HeadMeta(title, canonical, meta.toMap, jsonLd.result())
  }

  def extractMetadata(htmlBytes: Array[Byte]): HeadMeta =
    extractMetadata(CharsetSniff.decode(htmlBytes))
}
