package graft.sitemap

/** XML sitemap (sitemaps.org protocol 0.9) writer + parser — the seed-source
  * companion the reference leaves to its users: a crawler at Common-Crawl
  * scale bootstraps per-host frontiers from `robots.txt` Sitemap: pointers
  * (RFC 9309 §2.3 treats the line as an "other record"; our RobotsRules
  * skips it inside agent groups, this module consumes the documents).
  *
  * Writer emits the canonical urlset document; parser is a strict
  * byte-position scanner (no regex, no XML library): it walks `<url>`
  * blocks, extracts `<loc>` (required — blocks without one are dropped, per
  * the protocol) and `<lastmod>` (optional), unescapes the five XML
  * entities, and drops a truncated trailing block — the same
  * tolerant-tail posture as the WARC parser (`graft.warc.Warc`), because at
  * 100 TB some fetched sitemaps WILL be cut mid-record.
  *
  * `<urlset>` never false-matches a `<url>` open tag (the scanner requires
  * `>` or whitespace right after the name). Unknown tags inside a block
  * (`<priority>`, `<changefreq>`, extensions) are ignored, not errors.
  *
  * Scale: both directions are pure per-row string functions — a sitemap
  * column maps/flatMaps with no shuffle and no driver involvement.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: Option[String])

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case '\'' => sb.append("&apos;")
      case c => sb.append(c)
    }
    sb.toString
  }

  def unescape(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&apos;", "'").replace("&amp;", "&")

  /** Canonical urlset document (fixed header, one `<url>` block per entry,
    * entry order preserved — document order IS the writer's input order).
    */
  def write(entries: Seq[Entry]): String = {
    val sb = new StringBuilder(64 + entries.length * 64)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { e =>
      sb.append("  <url><loc>").append(escape(e.loc)).append("</loc>")
      e.lastmod.foreach(lm =>
        sb.append("<lastmod>").append(escape(lm)).append("</lastmod>"))
      sb.append("</url>\n")
    }
    sb.append("</urlset>\n")
    sb.toString
  }

  /** Parse `<url>` blocks in document order. Blocks missing `</url>`
    * (truncated tail) or `<loc>` are dropped.
    */
  def parse(xml: String): Seq[Entry] = parseBlocks(xml, "url")

  /** Sitemap INDEX file (sitemaps.org: `<sitemapindex>` of `<sitemap>`
    * blocks) — how every large site ships >50,000 urls: an index document
    * points at shard urlsets. Writer mirrors `write`; parser reuses the
    * same strict block scanner (`<sitemapindex>` never false-matches a
    * `<sitemap>` open tag, same guard as urlset/url).
    */
  def writeIndex(entries: Seq[Entry]): String = {
    val sb = new StringBuilder(64 + entries.length * 64)
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n")
    entries.foreach { e =>
      sb.append("  <sitemap><loc>").append(escape(e.loc)).append("</loc>")
      e.lastmod.foreach(lm =>
        sb.append("<lastmod>").append(escape(lm)).append("</lastmod>"))
      sb.append("</sitemap>\n")
    }
    sb.append("</sitemapindex>\n")
    sb.toString
  }

  /** Parse `<sitemap>` blocks of an index document, document order. */
  def parseIndex(xml: String): Seq[Entry] = parseBlocks(xml, "sitemap")

  private def parseBlocks(xml: String, name: String): Seq[Entry] = {
    val out = Seq.newBuilder[Entry]
    val close = s"</$name>"
    var i = 0
    var done = false
    while (!done) {
      val s = nextOpen(xml, name, i)
      if (s < 0) done = true
      else {
        val bodyStart = xml.indexOf('>', s)
        val e = if (bodyStart < 0) -1 else xml.indexOf(close, bodyStart)
        if (e < 0) done = true // truncated trailing block — drop
        else {
          val block = xml.substring(bodyStart + 1, e)
          tag(block, "loc").foreach { l =>
            out += Entry(unescape(l.trim), tag(block, "lastmod").map(t => unescape(t.trim)))
          }
          i = e + close.length
        }
      }
    }
    out.result()
  }

  /** Index of the next `<name>` / `<name ...>` open tag at or after `from`
    * whose tag name is exactly `name` (so "url" never matches "<urlset").
    */
  private def nextOpen(xml: String, name: String, from: Int): Int = {
    var i = from
    val probe = "<" + name
    while (i >= 0) {
      i = xml.indexOf(probe, i)
      if (i < 0) return -1
      val after = i + probe.length
      if (after < xml.length &&
          (xml.charAt(after) == '>' || Character.isWhitespace(xml.charAt(after))))
        return i
      i = after
    }
    -1
  }

  private def tag(block: String, name: String): Option[String] = {
    val a = nextOpen(block, name, 0)
    if (a < 0) None
    else {
      val bodyStart = block.indexOf('>', a)
      val b = if (bodyStart < 0) -1 else block.indexOf(s"</$name>", bodyStart)
      if (b < 0) None else Some(block.substring(bodyStart + 1, b))
    }
  }
}
