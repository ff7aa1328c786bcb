package graft.kernel

/** robots.txt parser and matcher per RFC 9309 (Robots Exclusion
  * Protocol) — the crawl-policy gate every fetch pipeline applies
  * before a URL enters the corpus. Implements the full normative
  * matching model: user-agent group selection by longest product-token
  * match with `*` fallback, rule matching with `*` wildcards and `$`
  * end anchors, MOST-SPECIFIC (longest-pattern) rule wins, allow wins
  * ties (§2.2.2), unmatched paths are allowed, and a missing/empty
  * file allows everything. `Crawl-delay` is retained per group (not in
  * the RFC, but the de-facto extension every crawler honors).
  *
  * The reference pipeline has no fetch stage (files arrive by upload),
  * so this is engine-side crawl reality like [[Warc]]: the operator
  * twin `ops/CrawlPolicy.robotsFilter` joins a URL table against a
  * per-host robots table.
  */
object Robots {

  final case class Group(agents: Vector[String],
                         rules: Vector[(Boolean, String)], // (isAllow, pattern)
                         crawlDelay: Option[Double])
  /** `sitemaps`: the file-level `Sitemap:` URLs (RFC 9309 §2.3 allows
    * them anywhere; they are NOT group-scoped) — the discovery seed a
    * crawler follows before fetching anything else on the host.
    */
  final case class RobotsFile(groups: Vector[Group],
                              sitemaps: Vector[String] = Vector.empty)

  /** Parse robots.txt content. Unknown directives are ignored; a rule
    * line before any user-agent line is ignored (RFC: rules belong to
    * groups); successive user-agent lines share one group; `#` starts
    * a comment anywhere on a line.
    */
  def parse(txt: String): RobotsFile = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var delay: Option[Double] = None
    var sitemaps = Vector.empty[String]
    var collectingAgents = false
    var inGroup = false
    def flush(): Unit = {
      if (inGroup) groups += Group(agents, rules, delay)
      agents = Vector.empty; rules = Vector.empty; delay = None
      inGroup = false
    }
    txt.split("\r?\n", -1).foreach { line0 =>
      val line = {
        val h = line0.indexOf('#')
        (if (h >= 0) line0.substring(0, h) else line0).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!collectingAgents) flush()
            collectingAgents = true; inGroup = true
            agents :+= value.toLowerCase
          case "allow" | "disallow" =>
            collectingAgents = false
            // an empty Disallow means "allow all" — representable as a
            // pattern that matches nothing, so simply skip the rule
            if (inGroup && value.nonEmpty) rules :+= (key == "allow", value)
          case "crawl-delay" =>
            collectingAgents = false
            if (inGroup) delay = value.toDoubleOption.orElse(delay)
          case "sitemap" =>
            collectingAgents = false // file-level; the group continues
            if (value.nonEmpty) sitemaps :+= value
          case _ =>
            collectingAgents = false // unknown directive: group continues
        }
      }
    }
    flush()
    RobotsFile(groups.result(), sitemaps)
  }

  /** §2.2.1 group selection: the group whose user-agent token is the
    * LONGEST prefix-or-exact match of `agent` wins; `*` groups are the
    * fallback. Multiple groups with the same best token merge (RFC:
    * "combined into one group").
    */
  private[kernel] def selectGroups(rf: RobotsFile, agent: String): Vector[Group] = {
    val a = agent.toLowerCase
    val scored = rf.groups.flatMap { g =>
      val best = g.agents.collect {
        case t if t != "*" && (a == t || a.startsWith(t)) => t.length
      }
      if (best.isEmpty) None else Some((best.max, g))
    }
    if (scored.nonEmpty) {
      val top = scored.map(_._1).max
      scored.collect { case (s, g) if s == top => g }
    } else rf.groups.filter(_.agents.contains("*"))
  }

  /** Pattern match with `*` (any run, incl. empty) and a trailing `$`
    * end anchor. Greedy backtracking over literal segments — linear in
    * practice (patterns are short paths).
    */
  private[kernel] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else if (i == parts.length - 1 && anchored) {
        // last literal must sit at the very end
        return path.length >= pos + part.length && path.endsWith(part)
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    if (anchored) pos == path.length else true
  }

  /** RFC 9309 §2.2.2 evaluation: over the selected group(s), the rule
    * with the longest pattern that matches decides; allow wins length
    * ties; no match → allowed. The pseudo-length of a matching rule is
    * the pattern's octet length (the RFC's specificity order).
    */
  def isAllowed(rf: RobotsFile, agent: String, path0: String): Boolean = {
    val path = if (path0.isEmpty) "/" else path0
    var bestLen = -1
    var bestAllow = true
    selectGroups(rf, agent).foreach(_.rules.foreach { case (allow, pat) =>
      if (matches(pat, path)) {
        val len = pat.length
        if (len > bestLen || (len == bestLen && allow && !bestAllow)) {
          bestLen = len; bestAllow = allow
        }
      }
    })
    bestAllow
  }

  /** The selected group's crawl delay for `agent` (None = unthrottled). */
  def crawlDelay(rf: RobotsFile, agent: String): Option[Double] =
    selectGroups(rf, agent).flatMap(_.crawlDelay).headOption
}
