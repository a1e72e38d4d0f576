package graft.url

/** RFC 3986 URL parsing + reference resolution matching Go `net/url`
  * semantics (the reference resolves every extracted href with
  * `r.Request.URL.Parse(href)` → `ResolveReference`,
  * /root/reference/client/response.go:26-34, geziyor_test.go:90-93).
  *
  * Pure Scala, no java.net.URI (whose resolve() follows RFC 2396 and
  * mis-handles empty and fragment-only references). Used from Spark as a
  * deterministic scalar UDF over extracted link columns.
  */
object UrlOps {

  /** Components per RFC 3986 appendix B. `authority`/`query`/`fragment` are
    * null when absent (distinct from empty — matters for recomposition).
    */
  final case class Url(
      scheme: String,     // null if relative reference
      authority: String,  // null if no '//'
      path: String,
      query: String,      // null if no '?'
      fragment: String    // null if no '#'
  ) {
    def host: String = {
      if (authority == null) return ""
      val noUser = authority.substring(authority.lastIndexOf('@') + 1)
      val c = noUser.lastIndexOf(':')
      // only strip a :port (digits) — IPv6 literals keep brackets
      if (c >= 0 && noUser.drop(c + 1).forall(_.isDigit) && !noUser.endsWith("]"))
        noUser.substring(0, c)
      else noUser
    }

    /** Recompose per RFC 3986 §5.3 (identical to Go URL.String for the
      * component set we carry).
      */
    override def toString: String = {
      val sb = new StringBuilder
      if (scheme != null) { sb.append(scheme); sb.append(':') }
      if (authority != null) { sb.append("//"); sb.append(authority) }
      sb.append(path)
      if (query != null) { sb.append('?'); sb.append(query) }
      if (fragment != null) { sb.append('#'); sb.append(fragment) }
      sb.toString
    }
  }

  private val UriRe =
    """^(([A-Za-z][A-Za-z0-9+.-]*):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?""".r

  /** Parse per RFC 3986 appendix B regex (never fails — worst case all-path,
    * like Go url.Parse for the href shapes fixtures contain).
    */
  def parse(s: String): Url = s match {
    case UriRe(_, scheme, auth0, auth, path, q0, query, f0, frag) =>
      Url(
        if (scheme == null) null else scheme.toLowerCase,
        if (auth0 == null) null else auth,
        if (path == null) "" else path,
        if (q0 == null) null else query,
        if (f0 == null) null else frag)
    case _ => Url(null, null, s, null, null)
  }

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); trimLastSeg(out) }
      else if (in == "/..") { in = "/"; trimLastSeg(out) }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', start)
        if (next < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, next)); in = in.substring(next) }
      }
    }
    out.toString
  }

  private def trimLastSeg(sb: StringBuilder): Unit = {
    val i = sb.lastIndexOf("/")
    sb.setLength(if (i < 0) 0 else i)
  }

  /** RFC 3986 §5.2.2 transform-references (strict), = Go ResolveReference. */
  def resolve(base: Url, ref: Url): Url = {
    if (ref.scheme != null)
      ref.copy(path = removeDotSegments(ref.path))
    else if (ref.authority != null)
      Url(base.scheme, ref.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    else if (ref.path.isEmpty) {
      val q = if (ref.query != null) ref.query else base.query
      Url(base.scheme, base.authority, base.path, q, ref.fragment)
    } else if (ref.path.startsWith("/"))
      Url(base.scheme, base.authority, removeDotSegments(ref.path), ref.query, ref.fragment)
    else {
      // merge (§5.2.3)
      val merged =
        if (base.authority != null && base.path.isEmpty) "/" + ref.path
        else {
          val i = base.path.lastIndexOf('/')
          if (i < 0) ref.path else base.path.substring(0, i + 1) + ref.path
        }
      Url(base.scheme, base.authority, removeDotSegments(merged), ref.query, ref.fragment)
    }
  }

  /** The engine's link-resolution primitive: absolute URL string of `href`
    * against `baseUrl`, fragment dropped (a crawl frontier never keys on
    * fragments — the reference's seen-set keys on the full resolved string,
    * and its fixtures never emit fragment links; dropping them here is the
    * crawl-correct choice and is covered by dedup tests).
    */
  def resolveLink(baseUrl: String, href: String): String = {
    val r = resolve(parse(baseUrl), parse(href))
    r.copy(fragment = null).toString
  }

  /** Canonical form for frontier keying at web scale — the reference's
    * seen-set keys on exact strings (duplicate_requests.go:18), which at
    * 10^10 URLs leaks trivially-aliased duplicates; canonicalization is
    * the standard crawl hygiene layer applied BEFORE the seen-set.
    * Normalizations (the safe RFC 3986 §6.2 set): lowercase scheme+host,
    * strip default ports (http:80, https:443), remove dot segments,
    * "" → "/" path when an authority is present, drop the fragment.
    * Percent-encoding and query normalization are intentionally NOT done
    * (they can change server-observable semantics).
    */
  def canonicalize(url: String): String = {
    val u = parse(url)
    val auth =
      if (u.authority == null) null
      else {
        val at = u.authority.lastIndexOf('@')
        val user = if (at >= 0) u.authority.substring(0, at + 1) else ""
        val hp = u.authority.substring(at + 1).toLowerCase
        // a trailing :80/:443 is always a port (an IPv6 literal is
        // bracketed, so its colons never end the authority)
        val stripped =
          if (u.scheme == "http" && hp.endsWith(":80")) hp.dropRight(3)
          else if (u.scheme == "https" && hp.endsWith(":443")) hp.dropRight(4)
          else hp
        user + stripped
      }
    val path0 = removeDotSegments(u.path)
    val path = if (auth != null && path0.isEmpty) "/" else path0
    Url(u.scheme, auth, path, u.query, null).toString
  }

  /** Host of an absolute URL (frontier partition key). */
  def hostOf(url: String): String = parse(url).host

  /** Path component ('' → '/', matching robots semantics). */
  def pathOf(url: String): String = {
    val p = parse(url).path
    if (p.isEmpty) "/" else p
  }
}
