package graft.kernel

/** Charset detection for crawl HTML bytes — the WHATWG-style sniff
  * every real crawl needs before tokenizing, since the long tail of the
  * web is windows-1252/Shift_JIS/GBK/…, not UTF-8. (The reference app
  * never faces this — it ingests PDFs — but the north-rule page table
  * carries raw `html BINARY` payloads straight off the wire.)
  *
  * Resolution order, per the HTML standard's encoding sniffing
  * algorithm (simplified to its deterministic core):
  *
  *  1. BOM: UTF-8 / UTF-16LE / UTF-16BE (BOM wins over everything);
  *  2. a `<meta charset=…>` / `<meta http-equiv="Content-Type"
  *     content="…; charset=…">` declaration scanned (ASCII-case-
  *     insensitively) in the first [[PrescanBytes]] bytes — labels
  *     resolve through the WHATWG alias rules that matter in practice
  *     (`iso-8859-1`/`latin1`/`ascii` → windows-1252, `shift-jis`
  *     spellings → Shift_JIS, `gb2312` → GBK, etc.);
  *  3. strict UTF-8 validation of the whole payload (a valid-UTF-8
  *     document is UTF-8 with near-certainty — mis-sniffing real UTF-8
  *     as 1252 is the classic mojibake bug);
  *  4. fallback windows-1252, the de-facto web default (a superset
  *     of ISO-8859-1 on the 0x80–0x9F range real pages actually use).
  *
  * Unknown/unsupported labels fall through to steps 3–4 rather than
  * erroring — C5: a crawl row must never kill a partition.
  */
object CharsetSniff {

  val PrescanBytes = 1024

  private val aliases: Map[String, String] = Map(
    "utf-8" -> "UTF-8", "utf8" -> "UTF-8",
    "iso-8859-1" -> "windows-1252", "latin1" -> "windows-1252",
    "latin-1" -> "windows-1252", "ascii" -> "windows-1252",
    "us-ascii" -> "windows-1252", "windows-1252" -> "windows-1252",
    "cp1252" -> "windows-1252",
    "iso-8859-2" -> "ISO-8859-2", "iso-8859-15" -> "ISO-8859-15",
    "windows-1251" -> "windows-1251", "koi8-r" -> "KOI8-R",
    "shift_jis" -> "Shift_JIS", "shift-jis" -> "Shift_JIS",
    "sjis" -> "Shift_JIS", "x-sjis" -> "Shift_JIS",
    "euc-jp" -> "EUC-JP",
    "gb2312" -> "GBK", "gbk" -> "GBK", "gb18030" -> "GB18030",
    "big5" -> "Big5", "euc-kr" -> "EUC-KR",
    "windows-1256" -> "windows-1256", "windows-1250" -> "windows-1250",
    "windows-1254" -> "windows-1254", "tis-620" -> "TIS-620",
    // WHATWG: a UTF-16 label found by the ASCII prescan maps to UTF-8 —
    // the prescan can only have read the label because the bytes are
    // ASCII-compatible, which genuine UTF-16 never is
    "utf-16" -> "UTF-8", "utf-16le" -> "UTF-8", "utf-16be" -> "UTF-8")

  /** The declared/sniffed charset name, for observability. */
  def sniff(bytes: Array[Byte]): String = {
    if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
      (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf) return "UTF-8"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xfe)
      return "UTF-16LE"
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe && (bytes(1) & 0xff) == 0xff)
      return "UTF-16BE"
    declared(bytes) match {
      case Some(cs) => cs
      case None => if (isValidUtf8(bytes)) "UTF-8" else "windows-1252"
    }
  }

  /** Decode crawl HTML bytes to text via [[sniff]]. Decoding never
    * throws: unmappable/malformed sequences become U+FFFD, like every
    * browser.
    */
  def decode(bytes: Array[Byte]): String = {
    val name = sniff(bytes)
    // strip only an ACTUAL byte-order mark — a BOM-less UTF-8 page whose
    // first character merely starts with 0xEF (U+F000..U+FFFF) keeps it
    val skip = name match {
      case "UTF-8" if bytes.length >= 3 && (bytes(0) & 0xff) == 0xef &&
        (bytes(1) & 0xff) == 0xbb && (bytes(2) & 0xff) == 0xbf => 3
      case "UTF-16LE" if bytes.length >= 2 && (bytes(0) & 0xff) == 0xff &&
        (bytes(1) & 0xff) == 0xfe => 2
      case "UTF-16BE" if bytes.length >= 2 && (bytes(0) & 0xff) == 0xfe &&
        (bytes(1) & 0xff) == 0xff => 2
      case _ => 0
    }
    val cs = java.nio.charset.Charset.forName(name)
    val dec = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
    dec.decode(java.nio.ByteBuffer.wrap(bytes, skip, bytes.length - skip)).toString
  }

  /** `<meta charset>` prescan over the first [[PrescanBytes]] bytes,
    * viewed as ASCII (every supported encoding is ASCII-transparent in
    * the markup bytes that matter; UTF-16 is handled by BOM first).
    */
  private def declared(bytes: Array[Byte]): Option[String] = {
    val n = math.min(bytes.length, PrescanBytes)
    val s = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      s.append(if (b >= 'A' && b <= 'Z') (b + 32).toChar else b.toChar)
      i += 1
    }
    val head = s.toString
    // WHATWG prescan: a charset declaration counts ONLY inside a <meta>
    // tag — honoring bare "charset=" anywhere would let an href query
    // string or inline script override correct UTF-8 detection
    // tag end = the first '>' OUTSIDE a quoted attribute value (the
    // WHATWG "get an attribute" prescan skips quoted values): a '>'
    // inside content="a>b; charset=…" must not truncate the tag before
    // the charset label
    def tagEndFrom(start: Int): Int = {
      var j = start
      var quote = 0.toChar
      // WHATWG get-an-attribute: a quote only DELIMITS a value when it is
      // the first char after '=' (plus whitespace) — an apostrophe inside
      // an unquoted value (content=O'Brien) must not swallow the real '>'
      var afterEq = false
      while (j < head.length) {
        val c = head.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if ((c == '"' || c == '\'') && afterEq) { quote = c; afterEq = false }
        else if (c == '>') return j
        else if (c == '=') afterEq = true
        else if (c != ' ' && c != '\t' && c != '\n' && c != '\r') afterEq = false
        j += 1
      }
      head.length
    }
    var metaAt = head.indexOf("<meta")
    while (metaAt >= 0) {
      val tagEnd = tagEndFrom(metaAt + 5)
      var at = head.indexOf("charset", metaAt)
      while (at >= 0 && at < tagEnd) {
        var j = at + 7
        while (j < tagEnd && (head.charAt(j) == ' ' || head.charAt(j) == '\t')) j += 1
        if (j < tagEnd && head.charAt(j) == '=') {
          j += 1
          while (j < tagEnd && (head.charAt(j) == ' ' || head.charAt(j) == '\t')) j += 1
          var quote = 0.toChar
          if (j < tagEnd && (head.charAt(j) == '"' || head.charAt(j) == '\'')) {
            quote = head.charAt(j); j += 1
          }
          val b = j
          while (j < tagEnd && {
            val c = head.charAt(j)
            if (quote != 0) c != quote
            else c != ' ' && c != '\t' && c != ';' && c != '"' && c != '\'' &&
              c != '>' && c != '/' && c != '\n' && c != '\r'
          }) j += 1
          val label = head.substring(b, j).trim
          aliases.get(label) match {
            case Some(cs) => return Some(cs)
            case None => // unknown label: keep scanning (a later meta may be valid)
          }
        }
        at = head.indexOf("charset", at + 7)
        if (at >= tagEnd) at = -1
      }
      metaAt = head.indexOf("<meta", metaAt + 5)
    }
    None
  }

  /** Strict UTF-8 validity (RFC 3629: no overlongs, no surrogates,
    * max U+10FFFF) — branchy but single-pass and allocation-free.
    */
  def isValidUtf8(bytes: Array[Byte]): Boolean = {
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b0 = bytes(i) & 0xff
      if (b0 < 0x80) i += 1
      else if (b0 < 0xc2) return false // continuation or overlong lead
      else if (b0 < 0xe0) { // 2-byte
        if (i + 1 >= n || (bytes(i + 1) & 0xc0) != 0x80) return false
        i += 2
      } else if (b0 < 0xf0) { // 3-byte
        if (i + 2 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80) return false
        if (b0 == 0xe0 && b1 < 0xa0) return false // overlong
        if (b0 == 0xed && b1 >= 0xa0) return false // surrogate
        i += 3
      } else if (b0 < 0xf5) { // 4-byte
        if (i + 3 >= n) return false
        val b1 = bytes(i + 1) & 0xff
        if ((b1 & 0xc0) != 0x80 || (bytes(i + 2) & 0xc0) != 0x80 ||
          (bytes(i + 3) & 0xc0) != 0x80) return false
        if (b0 == 0xf0 && b1 < 0x90) return false // overlong
        if (b0 == 0xf4 && b1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }
}
