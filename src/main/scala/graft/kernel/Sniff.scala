package graft.kernel

/** Content-type sniffing over raw payload bytes — the routing decision
  * a crawl ingester makes BEFORE trusting anything a server said
  * (Content-Type headers lie constantly; WHATWG MIME Sniffing exists
  * because of it). One function composing every magic check the
  * kernels already own, ordered so container formats (RIFF, zip, Ogg)
  * resolve to their specific type. Returns a canonical MIME string, or
  * `"application/octet-stream"` when nothing matches — never throws.
  */
object Sniff {

  def mime(p: Array[Byte]): String = {
    if (p == null || p.length < 4) return "application/octet-stream"
    def ascii(off: Int, s: String): Boolean =
      p.length >= off + s.length && s.indices.forall(i => p(off + i) == s.charAt(i).toByte)
    if (ascii(0, "%PDF-")) "application/pdf"
    else if (Media.isPng(p)) "image/png"
    else if (Jpeg.isJpeg(p)) "image/jpeg"
    else if (Media.isGif(p)) "image/gif"
    else if (WebP.isWebP(p)) "image/webp"
    else if (Media.isTiff(p)) "image/tiff"
    else if (Media.isBmp(p)) "image/bmp"
    else if (Media.isAvi(p)) "video/x-msvideo"
    else if (Media.isWav(p)) "audio/wav"
    else if (Webm.isWebm(p)) "video/webm"
    else if (Media.isMp4(p)) "video/mp4"
    else if (Flac.isFlac(p)) "audio/flac"
    else if (Ogg.isOgg(p)) "audio/ogg"
    else if (Mp3.isMp3(p)) "audio/mpeg"
    else if (Docx.isDocx(p))
      "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
    else if ((p(0) & 0xff) == 0x50 && (p(1) & 0xff) == 0x4b &&
      ((p(2) & 0xff) == 0x03 || (p(2) & 0xff) == 0x05)) "application/zip"
    else if ((p(0) & 0xff) == 0x1f && (p(1) & 0xff) == 0x8b) "application/gzip"
    else if ((p(0) & 0xff) == 0x28 && (p(1) & 0xff) == 0xb5 &&
      (p(2) & 0xff) == 0x2f && (p(3) & 0xff) == 0xfd) "application/zstd"
    else if (ascii(0, "WARC/")) "application/warc"
    else if (looksHtml(p)) "text/html"
    else if (looksXml(p)) "application/xml"
    else if (looksText(headAscii(p, 512))) "text/plain"
    else "application/octet-stream"
  }

  /** WHATWG-style HTML sniff: optional BOM/whitespace, then one of the
    * telltale tag openers (case-insensitive).
    */
  private def looksHtml(p: Array[Byte]): Boolean = {
    val s = headAscii(p, 512).trim.toLowerCase
    s.startsWith("<!doctype html") || s.startsWith("<html") ||
      s.startsWith("<head") || s.startsWith("<body") ||
      s.startsWith("<!--") && s.contains("<html") ||
      (s.startsWith("<") && Seq("<div", "<p>", "<p ", "<script", "<meta",
        "<title", "<h1").exists(s.contains))
  }

  private def looksXml(p: Array[Byte]): Boolean =
    headAscii(p, 64).trim.startsWith("<?xml")

  /** Printable-dominant BOM-decoded head with no NULs → text. */
  private def looksText(s: String): Boolean = {
    if (s.isEmpty) return false
    var printable = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == 0) return false
      if (c >= 0x20 || c == '\n' || c == '\r' || c == '\t') printable += 1
      i += 1
    }
    printable.toDouble / s.length > 0.95
  }

  private def headAscii(p: Array[Byte], n: Int): String = {
    // BOM-aware head (the WHATWG sniff reads through Unicode BOMs):
    // UTF-16 pages must still sniff as html/text, not binary
    if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xfe)
      new String(p, 2, math.min(n * 2, p.length - 2) & ~1,
        java.nio.charset.StandardCharsets.UTF_16LE)
    else if (p.length >= 2 && (p(0) & 0xff) == 0xfe && (p(1) & 0xff) == 0xff)
      new String(p, 2, math.min(n * 2, p.length - 2) & ~1,
        java.nio.charset.StandardCharsets.UTF_16BE)
    else {
      val off = if (p.length >= 3 && (p(0) & 0xff) == 0xef &&
        (p(1) & 0xff) == 0xbb && (p(2) & 0xff) == 0xbf) 3 else 0
      new String(p, off, math.min(n, p.length - off),
        java.nio.charset.StandardCharsets.ISO_8859_1)
    }
  }
}
