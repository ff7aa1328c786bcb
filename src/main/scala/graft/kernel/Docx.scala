package graft.kernel

/** DOCX text extraction — the office-document branch of the extraction
  * surface (web crawls carry .docx alongside HTML and PDF). A DOCX is a
  * ZIP ([[Zip]]) holding WordprocessingML; the document body lives in
  * `word/document.xml` and the visible text in `<w:t>` runs grouped
  * into `<w:p>` paragraphs.
  *
  * The scanner is a single pass over the XML bytes — no DOM: it tracks
  * `<w:t>`/`</w:t>` spans (including `<w:t xml:space="preserve">`),
  * emits a newline at every paragraph close `</w:p>`, expands the five
  * predefined XML entities plus numeric character references, maps
  * tabs/breaks (`<w:tab/>`, `<w:br/>`) to their text forms, skips
  * comments (whose unquoted `>` would otherwise truncate a tag scan)
  * and honors CDATA sections (literal text inside a run) — the same
  * single-pass discipline as [[HtmlStream]].
  */
object Docx {

  def isDocx(p: Array[Byte]): Boolean =
    Zip.isZip(p) && {
      // cheap probe: the content-types part every OOXML file starts with
      try Zip.entries(p).exists(_.name == "word/document.xml")
      catch { case _: Exception => false }
    }

  /** Visible text of the document body, paragraphs separated by '\n'. */
  def extractText(p: Array[Byte]): String = {
    val xmlBytes = Zip.extractByName(p, "word/document.xml")
      .getOrElse(throw new IllegalArgumentException("no word/document.xml"))
    // OPC permits UTF-16 parts: honor the BOM, default UTF-8
    val xml =
      if (xmlBytes.length >= 2 && (xmlBytes(0) & 0xff) == 0xff && (xmlBytes(1) & 0xff) == 0xfe)
        new String(xmlBytes, 2, xmlBytes.length - 2, java.nio.charset.StandardCharsets.UTF_16LE)
      else if (xmlBytes.length >= 2 && (xmlBytes(0) & 0xff) == 0xfe && (xmlBytes(1) & 0xff) == 0xff)
        new String(xmlBytes, 2, xmlBytes.length - 2, java.nio.charset.StandardCharsets.UTF_16BE)
      else new String(xmlBytes, java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder
    var i = 0
    var inText = false
    val n = xml.length
    // the real tag terminator: '>' OUTSIDE attribute quotes ('>' is legal
    // inside attribute values)
    def tagEnd(from: Int): Int = {
      var j = from
      var quote = 0.toChar
      while (j < n) {
        val ch = xml.charAt(j)
        if (quote != 0) { if (ch == quote) quote = 0 }
        else if (ch == '"' || ch == '\'') quote = ch
        else if (ch == '>') return j
        j += 1
      }
      throw new IllegalArgumentException("unterminated XML tag")
    }
    while (i < n) {
      val c = xml.charAt(i)
      if (c == '<' && xml.startsWith("<!--", i)) {
        // comments may contain unquoted '>' ("<!-- a > b -->") and are
        // legal anywhere third-party generators put them — including
        // inside a <w:t> run; their contents are never text
        val end = xml.indexOf("-->", i + 4)
        require(end >= 0, "unterminated XML comment")
        i = end + 3
      } else if (c == '<' && xml.startsWith("<![CDATA[", i)) {
        // CDATA inside a <w:t> run IS its literal text (no entity
        // expansion); outside a run it is markup noise to skip
        val end = xml.indexOf("]]>", i + 9)
        require(end >= 0, "unterminated CDATA section")
        if (inText) sb.append(xml, i + 9, end)
        i = end + 3
      } else if (c == '<') {
        val close = tagEnd(i + 1)
        val tag = xml.substring(i + 1, close)
        val name = {
          val t = if (tag.startsWith("/")) tag.substring(1) else tag
          // XML whitespace includes \n and \r, not just space/tab
          val sp = t.indexWhere(ch => ch == ' ' || ch == '/' || ch == '\t' ||
            ch == '\n' || ch == '\r')
          if (sp < 0) t else t.substring(0, sp)
        }
        if (tag.startsWith("/")) {
          name match {
            case "w:t" => inText = false
            case "w:p" => sb.append('\n')
            case _ => () // incl. </w:tab>/</w:br>: emitted at the open tag
          }
        } else {
          // <w:tab/> and <w:tab></w:tab> are XML-equivalent: emit on the
          // opening form either way
          name match {
            case "w:tab" => sb.append('\t')
            case "w:br" | "w:cr" => sb.append('\n')
            case "w:p" if tag.endsWith("/") => sb.append('\n') // empty para
            case "w:t" if !tag.endsWith("/") => inText = true
            case _ => ()
          }
        }
        i = close + 1
      } else if (inText) {
        if (c == '&') {
          val semi = xml.indexOf(';', i)
          require(semi > i && semi - i <= 12, "unterminated XML entity")
          val ent = xml.substring(i + 1, semi)
          sb.append(ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              new String(Character.toChars(Integer.parseInt(e.substring(2), 16)))
            case e if e.startsWith("#") =>
              new String(Character.toChars(Integer.parseInt(e.substring(1))))
            case e => throw new IllegalArgumentException(s"unknown entity &$e;")
          })
          i = semi + 1
        } else {
          sb.append(c)
          i += 1
        }
      } else i += 1
    }
    // trim the trailing paragraph newline like a text sink would
    val s = sb.toString
    if (s.endsWith("\n")) s.substring(0, s.length - 1) else s
  }
}
