package graft.pipeline

/** Full robots.txt matching — the semantics of the reference's robots
  * library (`temoto/robotstxt`, used at middleware/robotstxt.go:54,63 via
  * `FromStatusAndBytes` + `TestAgent(path, UserAgent)`) re-derived from the
  * public Robots Exclusion Protocol (RFC 9309 / the Google REP spec):
  *
  *  - per-agent GROUPS: consecutive `User-agent:` lines share one group of
  *    rules; the group whose (lowercased) agent token is the LONGEST prefix
  *    of the requesting UA wins; `*` is the fallback group;
  *  - `Allow:` and `Disallow:` both participate; among all rules matching a
  *    path the MOST SPECIFIC (longest pattern) wins; on a tie the
  *    least-restrictive (Allow) wins; no matching rule → allowed;
  *  - patterns are prefix-anchored with `*` wildcards and an optional `$`
  *    end anchor; empty-value rules are ignored (an empty `Disallow:`
  *    means "nothing disallowed");
  *  - status mapping (`FromStatusAndBytes`): 2xx → parse body; 4xx (incl.
  *    no robots.txt at all) → allow everything; 5xx → disallow everything.
  *
  * Pure Scala, no regex compilation in the hot loop — `matches` is a
  * hand-rolled prefix-anchored glob so the per-(request, rule) check stays
  * allocation-free inside the gate UDF.
  */
object RobotsRules {

  /** One rule of the selected group. `allow=false` = Disallow. */
  final case class Rule(path: String, allow: Boolean)

  /** Disallow-everything (5xx robots fetch): the empty pattern
    * prefix-matches every path and nothing can out-specific it when it is
    * the only rule.
    */
  val DisallowAll: Seq[Rule] = Seq(Rule("", allow = false))

  /** The UA-selected group: its rules plus its Crawl-delay (seconds,
    * fractional allowed — the reference's robots library exposes it as
    * `Group.CrawlDelay` even though geziyor itself never consults it;
    * this engine's politeness stage can, opt-in).
    */
  final case class Group(rules: Seq[Rule], crawlDelay: Option[Double])

  /** Parse a robots.txt body and select the group for `userAgent`
    * (longest agent-token prefix match, `*` fallback).
    */
  def group(body: String, userAgent: String): Group = {
    // group agent token (lowercased) → rules in file order (+ crawl-delay)
    val groups = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Rule]]
    val delays = scala.collection.mutable.HashMap.empty[String, Double]
    var currentAgents: List[String] = Nil
    var lastWasAgent = false
    body.linesIterator.foreach { raw =>
      val line = {
        val noComment = raw.indexOf('#') match {
          case -1 => raw
          case i => raw.substring(0, i)
        }
        noComment.trim
      }
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim.toLowerCase
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              // consecutive User-agent lines accumulate on one group; a
              // User-agent after rules starts a fresh group
              if (!lastWasAgent) currentAgents = Nil
              if (value.nonEmpty) {
                val token = value.toLowerCase
                currentAgents = token :: currentAgents
                groups.getOrElseUpdate(token,
                  scala.collection.mutable.ArrayBuffer.empty[Rule])
              }
              lastWasAgent = true
            case "allow" | "disallow" =>
              lastWasAgent = false
              // empty value = no rule (empty Disallow: nothing disallowed)
              if (value.nonEmpty)
                currentAgents.foreach(a =>
                  groups.get(a).foreach(_ += Rule(value, key == "allow")))
            case "crawl-delay" =>
              lastWasAgent = false
              try {
                val d = value.toDouble
                if (d > 0) currentAgents.foreach(a => delays(a) = d)
              } catch { case _: NumberFormatException => () }
            case _ =>
              // sitemap / unknown directives close the agent run but carry
              // no gate semantics in this engine
              lastWasAgent = false
          }
        }
      }
    }
    val ua = userAgent.toLowerCase
    // longest group token that is a prefix of the UA; '*' fallback
    val chosen = groups.keysIterator
      .filter(a => a != "*" && ua.startsWith(a))
      .foldLeft(Option.empty[String]) { (best, a) =>
        if (best.forall(_.length < a.length)) Some(a) else best
      }
      .orElse(if (groups.contains("*")) Some("*") else None)
    chosen.map(a => Group(groups(a).toSeq, delays.get(a)))
      .getOrElse(Group(Seq.empty, None))
  }

  /** The selected group's rules alone (the gate's shape). */
  def parse(body: String, userAgent: String): Seq[Rule] =
    group(body, userAgent).rules

  /** `Sitemap:` pointers (sitemaps.org discovery). The reference's robots
    * library collects these FILE-WIDE — `Sitemaps []string` on the parsed
    * robots data, independent of any agent group — in file order. Same
    * semantics here: case-insensitive key, comments stripped, value taken
    * verbatim (the protocol requires an absolute URL; we do not validate —
    * neither does the reference), empty values dropped, duplicates kept
    * (file order is the crawl-priority signal a frontier bootstrap uses).
    */
  def sitemaps(body: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    body.linesIterator.foreach { raw =>
      val line = {
        val noComment = raw.indexOf('#') match {
          case -1 => raw
          case i => raw.substring(0, i)
        }
        noComment.trim
      }
      val colon = line.indexOf(':')
      if (colon > 0 && line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val value = line.substring(colon + 1).trim
        if (value.nonEmpty) out += value
      }
    }
    out.toSeq
  }

  /** `FromStatusAndBytes` (the reference's entry): 2xx parse, 4xx/no-page
    * allow-all, 5xx disallow-all.
    */
  def fromStatus(status: Int, body: => String, userAgent: String): Seq[Rule] =
    fromStatusGroup(status, body, userAgent).rules

  /** Group-level `FromStatusAndBytes` (rules + Crawl-delay). */
  def fromStatusGroup(status: Int, body: => String, userAgent: String): Group =
    if (status >= 500) Group(DisallowAll, None)
    else if (status >= 400 || status < 200) Group(Seq.empty, None)
    else group(body, userAgent)

  /** Prefix-anchored glob: `*` matches any sequence, trailing `$` anchors
    * the end; without `$` the pattern matches any path it is a (glob)
    * prefix of.
    */
  private[graft] def matches(path: String, pattern: String): Boolean = {
    val endAnchor = pattern.nonEmpty && pattern.charAt(pattern.length - 1) == '$'
    val pat = if (endAnchor) pattern.substring(0, pattern.length - 1) else pattern
    val parts = pat.split("\\*", -1)
    if (!path.startsWith(parts(0))) return false
    var idx = parts(0).length
    var i = 1
    while (i < parts.length) {
      val part = parts(i)
      val last = i == parts.length - 1
      if (part.isEmpty) {
        // a trailing '*' consumes the rest (and satisfies any end anchor)
        if (last) idx = path.length
      } else if (last && endAnchor) {
        // the final literal must sit exactly at the END of the path
        val want = path.length - part.length
        if (want < idx || !path.startsWith(part, want)) return false
        idx = path.length
      } else {
        val found = path.indexOf(part, idx)
        if (found < 0) return false
        idx = found + part.length
      }
      i += 1
    }
    !endAnchor || idx == path.length
  }

  /** `allowed` over Spark struct rows (path: String, allow: Boolean) — the
    * gate UDF's shape; avoids re-materializing Rule objects per request row.
    */
  def allowedRows(path: String, rules: Seq[org.apache.spark.sql.Row]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      val p = r.getString(0)
      val a = r.getBoolean(1)
      if (matches(path, p)) {
        val l = p.length
        if (l > bestLen || (l == bestLen && a)) {
          bestLen = l
          bestAllow = a
        }
      }
    }
    bestAllow
  }

  /** Longest-match decision over the selected group: among matching rules
    * the longest pattern wins; tie → Allow; none → allowed.
    */
  def allowed(path: String, rules: Seq[Rule]): Boolean = {
    var bestLen = -1
    var bestAllow = true
    rules.foreach { r =>
      if (matches(path, r.path)) {
        val l = r.path.length
        if (l > bestLen || (l == bestLen && r.allow)) {
          bestLen = l
          bestAllow = r.allow
        }
      }
    }
    bestAllow
  }
}
