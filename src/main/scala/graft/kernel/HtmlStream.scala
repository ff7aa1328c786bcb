package graft.kernel

/** Single-pass, allocation-light HTML extraction — the production kernel
  * behind [[Html.extract]].
  *
  * Produces results **identical** to the executable spec
  * [[Html.extractDom]] (tokenizer → DOM → segment → classify) without
  * materializing tokens or a DOM: tag events drive the segmentation state
  * machine directly, text characters flow into the current block buffer
  * with inline entity decoding, and the element stack replicates the DOM
  * builder's implied-close rules exactly. Differential-tested against
  * `extractDom` over the full fixture grammar plus hand-built edge cases
  * (HtmlKernelSpec).
  *
  * Why it exists: the DOM path allocates ~10^3 objects per page (tokens,
  * attribute maps, element nodes, child buffers); at 32 concurrent
  * executor threads that allocation pressure inflates per-doc CPU ~2× and
  * caps throughput scaling. The streaming path allocates only block
  * strings and the output.
  *
  * Equivalence argument for inline entity decoding: the DOM tokenizer
  * decodes per text node (a `;` is only found *within* the node), while
  * this pass searches the whole document for the `;`. The two can only
  * disagree when an entity body would span a node boundary — but every
  * node ends at a `<`, so any spanning body contains `<` and is rejected
  * by both (named lookup and numeric parse fail) → both emit `&`
  * verbatim.
  */
object HtmlStream {
  import Html._

  private final val FBlock = 1
  private final val FBoiler = 2
  private final val FAnchor = 4

  private def flagsOf(name: String): Int = {
    var f = 0
    if (blockTags(name)) f |= FBlock
    if (boilerAncestors(name)) f |= FBoiler
    if (name == "a") f |= FAnchor
    if (name.length == 2 && name.charAt(0) == 'h' && name.charAt(1).isDigit)
      f |= (name.charAt(1) - '0') << 4
    f
  }

  def extract(htmlBytes: Array[Byte]): Html.Extraction =
    extract(CharsetSniff.decode(htmlBytes))

  def extract(html: String): Html.Extraction = Html.classify(segmentStream(html))

  /** One fused pass: tokenizer events → implied-close stack → blocks. */
  def segmentStream(html: String): Segmented = {
    val n = html.length

    // ---- segmentation state (mirrors Html.segment)
    val blocks = Vector.newBuilder[Block]
    val headings = Vector.newBuilder[String]
    var title = ""
    val raw = new java.lang.StringBuilder(128)
    var anchorChars = 0
    var anchorDepth = 0
    var headingLevel = 0
    var boilerDepth = 0

    // `raw` holds the block text ALREADY whitespace-collapsed: runs fold
    // to one ' ' at append time (blockPending), leading ws is dropped by
    // the raw.length guard, trailing ws is never appended \u2014 so flush()
    // equals collapseWs(uncollapsed concat) with one string copy instead
    // of two per block.
    var blockPending = false

    def flush(): Unit = {
      if (raw.length > 0) {
        val txt = raw.toString
        blocks += Block(txt, countWords(txt), math.min(anchorChars, txt.length),
          txt.length, headingLevel, boilerDepth > 0)
        if (headingLevel > 0) headings += txt
      }
      raw.setLength(0); anchorChars = 0; blockPending = false
    }

    // ---- per-text-node collapsed length (for anchorChars), no alloc
    var nodeLen = 0
    var nodePending = false
    var nodeStarted = false
    def nodeChar(c: Char): Unit = {
      if (c.isWhitespace || c == '\u00A0') { nodePending = true; blockPending = true }
      else {
        if (nodePending && nodeStarted) nodeLen += 1
        nodePending = false; nodeStarted = true; nodeLen += 1
        if (blockPending && raw.length > 0) raw.append(' ')
        blockPending = false
        raw.append(c)
      }
    }
    def endTextNode(): Unit = {
      if (anchorDepth > 0) anchorChars += nodeLen
      nodeLen = 0; nodePending = false; nodeStarted = false
    }

    // ---- element stack with the DOM builder's pop rules
    var stN = 0
    var stNames = new Array[String](16)
    var stFlags = new Array[Int](16)
    def push(name: String, flags: Int): Unit = {
      if (stN == stNames.length) {
        stNames = java.util.Arrays.copyOf(stNames, stN * 2)
        stFlags = java.util.Arrays.copyOf(stFlags, stN * 2)
      }
      stNames(stN) = name; stFlags(stN) = flags; stN += 1
    }
    def enter(flags: Int): Unit = {
      if ((flags & FBlock) != 0) flush()
      val h = flags >>> 4
      if (h > 0) headingLevel = h
      if ((flags & FBoiler) != 0) boilerDepth += 1
      if ((flags & FAnchor) != 0) anchorDepth += 1
    }
    def exit(flags: Int): Unit = {
      if ((flags & FAnchor) != 0) anchorDepth -= 1
      if ((flags & FBlock) != 0) flush()
      if ((flags >>> 4) > 0) headingLevel = 0
      if ((flags & FBoiler) != 0) boilerDepth -= 1
    }
    /** Pop frames from the top through depth-from-top index `idx`. */
    def popTo(idx: Int): Unit = {
      var k = 0
      while (k <= idx) { stN -= 1; exit(stFlags(stN)); k += 1 }
    }
    def findFromTop(name: String): Int = {
      var k = 0
      while (k < stN) { if (stNames(stN - 1 - k) == name) return k; k += 1 }
      -1
    }
    def findFirstOf(a: String, b: String, c: String, d: String): Int = {
      var k = 0
      while (k < stN) {
        val nm = stNames(stN - 1 - k)
        if (nm == a || nm == b || nm == c || (d != null && nm == d)) return k
        k += 1
      }
      -1
    }
    def closeImplied(name: String): Unit = {
      if (pClosers(name)) {
        val idx = findFromTop("p")
        if (idx >= 0) popTo(idx)
      }
      name match {
        case "li" =>
          val idx = findFirstOf("li", "ul", "ol", null)
          if (idx >= 0 && stNames(stN - 1 - idx) == "li") popTo(idx)
        case "td" | "th" =>
          val idx = findFirstOf("td", "th", "tr", "table")
          if (idx >= 0 && { val nm = stNames(stN - 1 - idx); nm == "td" || nm == "th" }) popTo(idx)
        case "tr" =>
          val idx = findFirstOf("tr", "table", "table", null)
          if (idx >= 0 && stNames(stN - 1 - idx) == "tr") popTo(idx)
        case "dt" | "dd" =>
          val idx = findFirstOf("dt", "dd", "dl", null)
          if (idx >= 0 && { val nm = stNames(stN - 1 - idx); nm == "dt" || nm == "dd" }) popTo(idx)
        case _ =>
      }
    }
    def onEnd(name: String): Unit =
      if (!voidTags(name)) {
        val idx = findFromTop(name)
        if (idx >= 0) popTo(idx)
      }

    def lowerAt(idx: Int, lit: String): Boolean =
      idx + lit.length <= n && html.regionMatches(true, idx, lit, 0, lit.length)

    // ---- main scan (mirrors Html.tokenize, events handled inline)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (lowerAt(i, "<!--")) {
          endTextNode()
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (lowerAt(i, "<![cdata[")) {
          endTextNode()
          val end = html.indexOf("]]>", i + 9)
          val stop = if (end < 0) n else end
          if (stop > i + 9) { // CDATA: its own text node, no entity decode
            var k = i + 9
            while (k < stop) { nodeChar(html.charAt(k)); k += 1 }
            endTextNode()
          }
          i = if (end < 0) n else end + 3
        } else if (lowerAt(i, "<!") || lowerAt(i, "<?")) { // doctype / PI
          endTextNode()
          val end = html.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n && (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
          endTextNode()
          val closing = html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          // attribute scan — byte-for-byte the tokenizer's advancement,
          // values discarded
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
              if (aStart == j && (j >= n || html.charAt(j) != '=')) j += 1
              else {
                while (j < n && html.charAt(j).isWhitespace) j += 1
                if (j < n && html.charAt(j) == '=') {
                  j += 1
                  while (j < n && html.charAt(j).isWhitespace) j += 1
                  if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
                    val q = html.charAt(j); j += 1
                    while (j < n && html.charAt(j) != q) j += 1
                    if (j < n) j += 1
                  } else {
                    while (j < n && !html.charAt(j).isWhitespace && html.charAt(j) != '>') j += 1
                  }
                }
              }
            }
          }
          if (closing) { onEnd(name); i = j }
          else {
            closeImplied(name)
            val flags = flagsOf(name)
            if (voidTags(name) || selfClosing) {
              if (name == "br") blockPending = true // br == ws run member
              else { enter(flags); exit(flags) }
              i = j
            } else if (rawTextTags(name)) {
              push(name, flags) // flags are 0 for all raw-text tags
              val close = "</" + name
              var k = html.indexOf(close, j)
              while (k >= 0 && k + close.length < n && {
                val ch = html.charAt(k + close.length); !(ch == '>' || ch.isWhitespace)
              }) k = html.indexOf(close, k + 1)
              val stop = if (k < 0) n else k
              if (name == "title" && title.isEmpty && stop > j)
                title = collapseWs(decodeEntities(html.substring(j, stop)))
              // textarea/script/style bodies are dropped entirely
              if (k < 0) i = n
              else {
                val gt = html.indexOf('>', k)
                i = if (gt < 0) n else gt + 1
              }
              onEnd(name)
            } else {
              push(name, flags)
              enter(flags)
              i = j
            }
          }
        } else { nodeChar('<'); i += 1 } // stray '<'
      } else if (c == '&') {
        // inline entity decode (see equivalence note in the scaladoc)
        val semi = html.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val body = html.substring(i + 1, semi)
          val rep =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(2), 16))))
              catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try Some(new String(Character.toChars(Integer.parseInt(body.substring(1)))))
              catch { case _: Exception => None }
            } else namedEntities.get(body)
          rep match {
            case Some(r) =>
              var k = 0
              while (k < r.length) { nodeChar(r.charAt(k)); k += 1 }
              i = semi + 1
            case None => nodeChar('&'); i += 1
          }
        } else { nodeChar('&'); i += 1 }
      } else { nodeChar(c); i += 1 }
    }
    endTextNode()
    while (stN > 0) { stN -= 1; exit(stFlags(stN)) }
    flush()
    Segmented(title, blocks.result(), headings.result())
  }
}
