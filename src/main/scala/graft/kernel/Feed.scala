package graft.kernel

/** Web-feed parser — RSS 2.0 (RSS Advisory Board spec), Atom 1.0
  * (RFC 4287) and RSS 1.0/RDF — the URL-discovery channel next to
  * [[Sitemap]]: feeds surface NEW documents hours before sitemaps
  * regenerate, so a crawl frontier consumes both. Same scanning
  * posture as the sitemap kernel (small strict scanner, namespace
  * prefixes stripped, XML entities + CDATA decoded, gzip unwrapped,
  * non-feed input throws for per-row C5 isolation), plus the two
  * things feeds add over sitemaps: ATTRIBUTE-carried links (Atom's
  * `<link href=… rel=…>`) and RFC 822 timestamps (RSS `pubDate`).
  */
object Feed {

  final case class FeedItem(title: String, link: String, id: String,
                            publishedMs: Long, summary: String)
  /** kind: "rss" | "atom" | "rdf" */
  final case class ParsedFeed(kind: String, title: String, link: String,
                              items: Vector[FeedItem])

  /** RFC 822/1123 date (RSS pubDate): `Mon, 02 Sep 2024 08:30:00 GMT`,
    * numeric zones, missing day-of-week and 2-digit years tolerated →
    * epoch ms; 0 when unparseable (sentinel over throw, as with
    * sitemap lastmod — feed dates in the wild are chaos).
    */
  private[kernel] def parseRfc822(s0: String): Long = {
    val s = s0.trim
    if (s.isEmpty) return 0L
    val formats = Seq(
      java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME,
      java.time.format.DateTimeFormatter.ofPattern(
        "d MMM yyyy HH:mm:ss Z", java.util.Locale.US),
      java.time.format.DateTimeFormatter.ofPattern(
        "EEE, d MMM yyyy HH:mm Z", java.util.Locale.US))
    // normalize the common named zones RFC_1123 refuses
    val zoned = s.replaceAll("\\b(UT|Z)$", "GMT")
      .replaceAll("\\bEST$", "-0500").replaceAll("\\bEDT$", "-0400")
      .replaceAll("\\bCST$", "-0600").replaceAll("\\bCDT$", "-0500")
      .replaceAll("\\bMST$", "-0700").replaceAll("\\bMDT$", "-0600")
      .replaceAll("\\bPST$", "-0800").replaceAll("\\bPDT$", "-0700")
    formats.foreach { f =>
      try return java.time.OffsetDateTime.parse(zoned, f).toInstant.toEpochMilli
      catch { case _: Exception => }
    }
    // Atom-style W3C datetime sneaking into an RSS field
    Sitemap.parseW3cDatetime(s)
  }

  def parse(payload: Array[Byte]): ParsedFeed = {
    val bytes = Sitemap.gunzipIfNeeded(payload)
    val xml = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)

    def stripNs(n: String): String = {
      val c = n.indexOf(':')
      if (c >= 0) n.substring(c + 1) else n
    }
    def tagNameAt(p: Int): String = {
      var j = p + 1
      val sb = new java.lang.StringBuilder()
      while (j < xml.length && !Character.isWhitespace(xml.charAt(j)) &&
        xml.charAt(j) != '>' && xml.charAt(j) != '/') {
        sb.append(xml.charAt(j)); j += 1
      }
      stripNs(sb.toString)
    }
    /** attributes of the tag spanning [pos, gt) — names lowercased +
      * namespace-stripped, values entity-decoded
      */
    def attrsAt(pos: Int, gt: Int): Map[String, String] = {
      val out = Map.newBuilder[String, String]
      var j = pos + 1
      while (j < gt && !Character.isWhitespace(xml.charAt(j)) &&
        xml.charAt(j) != '>') j += 1 // skip tag name
      while (j < gt) {
        while (j < gt && (Character.isWhitespace(xml.charAt(j)) || xml.charAt(j) == '/')) j += 1
        val ns = j
        while (j < gt && xml.charAt(j) != '=' &&
          !Character.isWhitespace(xml.charAt(j)) && xml.charAt(j) != '/') j += 1
        if (j > ns && j < gt && xml.charAt(j) == '=') {
          val name = stripNs(xml.substring(ns, j).toLowerCase)
          j += 1
          if (j < gt && (xml.charAt(j) == '"' || xml.charAt(j) == '\'')) {
            val q = xml.charAt(j); j += 1
            val vs = j
            while (j < gt && xml.charAt(j) != q) j += 1
            out += name -> Sitemap.decodeEntities(xml.substring(vs, j))
            j += 1
          }
        }
      }
      out.result()
    }

    // find root element past prolog/comments/doctype
    var i = xml.indexOf('<')
    require(i >= 0, "no XML content")
    var root: String = null
    while (root == null && i >= 0 && i < xml.length) {
      val nm = tagNameAt(i)
      if (nm.startsWith("?") || nm.startsWith("!")) i = xml.indexOf('<', i + 1)
      else root = nm
    }
    val kind = root match {
      case "rss" => "rss"
      case "feed" => "atom"
      case "RDF" | "rdf" => "rdf"
      case other => throw new IllegalArgumentException(s"not a feed root: <$other>")
    }
    val entryTag = if (kind == "atom") "entry" else "item"

    val items = Vector.newBuilder[FeedItem]
    var feedTitle = ""; var feedLink = ""
    var title = ""; var link = ""; var id = ""; var published = 0L; var summary = ""
    var linkIsAlternate = false
    var inEntry = false
    var sawFeedTitle = false
    var pos = xml.indexOf('<', i)
    while (pos >= 0) {
      val isClose = pos + 1 < xml.length && xml.charAt(pos + 1) == '/'
      val nm = tagNameAt(if (isClose) pos + 1 else pos)
      if (nm.startsWith("!") && xml.startsWith("<![CDATA[", pos)) {
        pos = xml.indexOf("]]>", pos)
        require(pos >= 0, "unterminated CDATA")
        pos = xml.indexOf('<', pos)
      } else {
        val gt = xml.indexOf('>', pos)
        require(gt > pos, "unterminated tag")
        val selfClosing = xml.charAt(gt - 1) == '/'
        def textUntilClose(): (String, Int) = {
          // CDATA-aware: a summary may carry "</" inside its CDATA block
          var scan = gt + 1
          if (xml.startsWith("<![CDATA[", scan)) {
            val cdEnd = xml.indexOf("]]>", scan)
            require(cdEnd >= 0, "unterminated CDATA")
            val inner = xml.substring(scan + 9, cdEnd)
            val close = xml.indexOf('>', xml.indexOf("</", cdEnd).max(cdEnd))
            (inner, if (close >= 0) close else cdEnd)
          } else {
            val end = xml.indexOf("</", scan)
            require(end >= 0, s"unterminated <$nm>")
            val close = xml.indexOf('>', end)
            (Sitemap.decodeEntities(xml.substring(scan, end).trim),
              if (close >= 0) close else end)
          }
        }
        var resume = gt
        if (!isClose && nm == entryTag) {
          inEntry = true; title = ""; link = ""; id = ""; published = 0L
          summary = ""; linkIsAlternate = false
        } else if (isClose && nm == entryTag) {
          items += FeedItem(title, link, id, published, summary)
          inEntry = false
        } else if (!isClose) {
          nm match {
            case "title" if !inEntry && !sawFeedTitle && !selfClosing =>
              val (t, r) = textUntilClose(); feedTitle = t; sawFeedTitle = true; resume = r
            case "link" if !inEntry =>
              if (kind == "atom") {
                val a = attrsAt(pos, gt)
                val rel = a.getOrElse("rel", "alternate")
                if (feedLink.isEmpty && rel == "alternate")
                  feedLink = a.getOrElse("href", "")
              } else if (!selfClosing && feedLink.isEmpty) {
                val (t, r) = textUntilClose(); feedLink = t; resume = r
              }
            case "title" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose(); title = t; resume = r
            case "link" if inEntry =>
              if (kind == "atom") {
                // prefer the first rel=alternate link; any href as fallback
                val a = attrsAt(pos, gt)
                val rel = a.getOrElse("rel", "alternate")
                if (a.contains("href") &&
                  (link.isEmpty || (rel == "alternate" && !linkIsAlternate))) {
                  link = a("href")
                  linkIsAlternate = rel == "alternate"
                }
              } else if (!selfClosing) {
                val (t, r) = textUntilClose(); link = t; resume = r
              }
            case "guid" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose(); id = t; resume = r
            case "id" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose(); id = t; resume = r
            case "pubdate" | "pubDate" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose(); published = parseRfc822(t); resume = r
            case "date" if inEntry && !selfClosing => // RSS 1.0 dc:date
              val (t, r) = textUntilClose()
              published = Sitemap.parseW3cDatetime(t); resume = r
            case "published" | "updated" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose()
              if (published == 0L || nm == "published")
                published = Sitemap.parseW3cDatetime(t)
              resume = r
            case "description" | "summary" if inEntry && !selfClosing =>
              val (t, r) = textUntilClose(); summary = t; resume = r
            case _ => ()
          }
        }
        pos = xml.indexOf('<', resume)
      }
    }
    ParsedFeed(kind, feedTitle, feedLink, items.result())
  }
}
