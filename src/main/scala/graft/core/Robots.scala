package graft.core

/** RFC 9309 robots.txt parser — the missing producer half of the crawl
  * politeness stack: [[graft.datapipe.GraphOps.robotsFilter]] (e28)
  * consumes a parsed per-host (prefix, allow) rule table, and THIS is
  * the grammar that turns fetched robots.txt bodies into that table,
  * selected for one crawler product token. Reference behavior:
  * ocr-service fetches with plain HTTP clients and leaves robots
  * compliance to its callers; a web-scale crawl cannot, so this is part
  * of the frontier contract (SURVEY §2.9 crawl side).
  *
  * Grammar implemented (RFC 9309 §2.2 line records):
  *   - lines split on CRLF/CR/LF; `#` starts a comment to EOL; blank
  *     lines are ignored (they do NOT end a group — only a new
  *     `User-agent` line after rules does, §2.2.1).
  *   - each record is `key : value`, key matched case-insensitively,
  *     both sides trimmed; colonless lines are skipped with the loop
  *     still advancing (the m6 foot-gun).
  *   - consecutive `User-agent` lines STACK onto one group (a rule
  *     block may serve several agents); a `User-agent` after rules
  *     starts a new group.
  *   - `Allow` / `Disallow` before any `User-agent` line belong to no
  *     group and are DROPPED (§2.2.2: rules outside a group are
  *     unparseable records). An EMPTY `Disallow:` value is the
  *     spec-blessed "allow everything" idiom and contributes no rule;
  *     an empty `Allow:` likewise.
  *   - `Sitemap` is a GLOBAL record (§2.3 "other records"): collected
  *     in file order regardless of position, and it does not disturb
  *     group structure even between a group's UA line and its rules.
  *   - `Crawl-delay` (non-RFC but universally honored) attaches to the
  *     current group; the first NUMERIC value wins (the Directives
  *     first-wins discipline), non-numeric values are ignored.
  *   - unknown keys are skipped without breaking the group, matching
  *     the RFC's "ignore unsupported records" rule.
  *
  * Agent selection (§2.2.1): candidate groups are those with a UA
  * token that is a case-insensitive PREFIX of the crawler's product
  * token (exact match is the full-length prefix, so longest-prefix
  * subsumes it — and matches deployed practice, e.g. a `googlebot`
  * group applying to Googlebot-Image); the LONGEST matching token
  * wins, ALL groups carrying exactly that token merge in file order
  * (§2.2.2 "combine the rules"). No match falls back to the `*`
  * groups, merged the same way; no `*` either means no rules — the
  * URL-level default-allow in robotsFilter then admits everything.
  * Wildcard/`$` path patterns are out of scope here exactly as they
  * are in robotsFilter (prefix rules only, documented there).
  */
object Robots {

  final case class Rule(idx: Int, prefix: String, allow: Boolean)
  final case class Policy(rules: Vector[Rule], crawlDelay: Option[Long],
                          sitemaps: Vector[String])

  private final case class Group(uas: Vector[String],
                                 rules: Vector[(String, Boolean)],
                                 delay: Option[Long])

  def parse(body: String, agent: String): Policy = {
    val sitemaps = Vector.newBuilder[String]
    val groups = Vector.newBuilder[Group]
    var uas = Vector.empty[String]
    var rules = Vector.empty[(String, Boolean)]
    var delay: Option[Long] = None
    // true while consecutive user-agent lines are still stacking onto
    // the group being opened; any rule-ish record flips it off
    var collecting = false
    def flush(): Unit = {
      if (uas.nonEmpty) groups += Group(uas, rules, delay)
      uas = Vector.empty; rules = Vector.empty; delay = None
    }
    for (raw <- body.split("\r\n|\r|\n")) {
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!collecting) { flush(); collecting = true }
              if (value.nonEmpty)
                uas :+= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              collecting = false
              if (uas.nonEmpty && value.nonEmpty)
                rules :+= ((value, key == "allow"))
            case "crawl-delay" =>
              collecting = false
              if (uas.nonEmpty && delay.isEmpty && value.matches("[0-9]{1,10}"))
                delay = Some(value.toLong)
            case "sitemap" =>
              // global record: collected verbatim, group state untouched
              if (value.nonEmpty) sitemaps += value
            case _ => () // unknown record: ignored, group intact
          }
        }
      }
    }
    flush()
    val gs = groups.result()
    val tok = agent.toLowerCase(java.util.Locale.ROOT)
    val specific = gs.flatMap(g => g.uas.filter(u => u != "*" && tok.startsWith(u)))
    val winner: Option[String] =
      if (specific.nonEmpty) Some(specific.maxBy(_.length))
      else if (gs.exists(_.uas.contains("*"))) Some("*")
      else None
    winner match {
      case None => Policy(Vector.empty, None, sitemaps.result())
      case Some(w) =>
        val sel = gs.filter(_.uas.contains(w))
        val rs = sel.flatMap(_.rules).zipWithIndex
          .map { case ((p, a), i) => Rule(i, p, a) }
        Policy(rs, sel.flatMap(_.delay).headOption, sitemaps.result())
    }
  }
}
