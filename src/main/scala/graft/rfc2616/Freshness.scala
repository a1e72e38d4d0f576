package graft.rfc2616

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset, ZonedDateTime}
import scala.util.Try

/** RFC 2616/7234 private-cache decision logic — a pure-function
  * re-implementation of the reference's RFC2616 cache policy
  * (cache/cache.go:338-499: getFreshness, canStaleOnError, canStore,
  * varyMatches, validator injection, 304 header merge). No I/O; the clock is
  * a parameter (`now`) exactly like the reference's injectable fake clock
  * (cache/cache_test.go:24-30).
  *
  * In the Spark engine these functions drive the fetched-state table:
  * `getFreshness` decides which cached rows are served vs re-validated —
  * a timestamp predicate over the state table (partition-pruning-friendly,
  * see q14_cache_freshness), with the conditional-request path joining on
  * (url, etag / last_modified).
  */
object Freshness {

  sealed trait Decision
  case object Fresh extends Decision        // serve from cache
  case object Stale extends Decision        // validate before serving
  case object Transparent extends Decision  // bypass cache entirely

  type Headers = Map[String, String] // case-insensitive get via `h()`

  private def h(m: Headers, k: String): Option[String] =
    m.collectFirst { case (kk, v) if kk.equalsIgnoreCase(k) => v }

  private val Rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME

  def parseHttpDate(s: String): Option[Instant] =
    Try(ZonedDateTime.parse(s, Rfc1123).toInstant).toOption

  def formatHttpDate(i: Instant): String =
    Rfc1123.format(i.atZone(ZoneOffset.UTC))

  /** Cache-Control parse: comma-separated `k` or `k=v` tokens, quotes
    * stripped (cache/cache.go:529-551 semantics).
    */
  def parseCacheControl(headers: Headers): Map[String, String] =
    h(headers, "Cache-Control").map { cc =>
      cc.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { tok =>
        val i = tok.indexOf('=')
        if (i < 0) tok.toLowerCase -> ""
        else tok.substring(0, i).trim.toLowerCase ->
          tok.substring(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
      }.toMap
    }.getOrElse(Map.empty)

  private def seconds(v: String): Option[Long] = Try(v.trim.toLong).toOption

  /** fresh/stale/transparent per the reference's getFreshness
    * (cache/cache.go:338-417): request no-cache → transparent; response
    * no-cache → stale; request only-if-cached → fresh; no Date → stale;
    * lifetime = response max-age, else Expires−Date; request max-age
    * overrides; min-fresh inflates the age; max-stale (valueless → always
    * fresh) deflates it; fresh iff lifetime > age.
    */
  def getFreshness(respHeaders: Headers, reqHeaders: Headers,
      now: Instant): Decision = {
    val respCc = parseCacheControl(respHeaders)
    val reqCc = parseCacheControl(reqHeaders)
    if (reqCc.contains("no-cache")) return Transparent
    if (respCc.contains("no-cache")) return Stale
    if (reqCc.contains("only-if-cached")) return Fresh

    val date = h(respHeaders, "Date").flatMap(parseHttpDate) match {
      case Some(d) => d
      case None => return Stale
    }
    var ageSecs = java.time.Duration.between(date, now).getSeconds

    // max-age PRESENT but unparseable → lifetime 0 (cache.go:365-376 sets
    // zero and moves on — no Expires fallback in that branch)
    var lifetime = respCc.get("max-age") match {
      case Some(v) => seconds(v).getOrElse(0L)
      case None =>
        h(respHeaders, "Expires").flatMap(parseHttpDate)
          .map(e => java.time.Duration.between(date, e).getSeconds)
          .getOrElse(0L)
    }
    reqCc.get("max-age").flatMap(seconds).foreach(lifetime = _)
    reqCc.get("min-fresh").flatMap(seconds).foreach(mf => ageSecs += mf)
    reqCc.get("max-stale") match {
      case Some("") => return Fresh
      case Some(ms) => seconds(ms).foreach(s => ageSecs -= s)
      case None =>
    }
    if (lifetime > ageSecs) Fresh else Stale
  }

  /** RFC 5861 stale-if-error (cache/cache.go:421-461): valueless directive →
    * always; with a value → only while age < value.
    */
  def canStaleOnError(respHeaders: Headers, reqHeaders: Headers,
      now: Instant): Boolean = {
    val respV = parseCacheControl(respHeaders).get("stale-if-error")
    val reqV = parseCacheControl(reqHeaders).get("stale-if-error")
    (respV, reqV) match {
      case (Some(""), _) | (_, Some("")) => true
      case (None, None) => false
      case _ =>
        // the reference applies the REQUEST directive last (cache.go:
        // 421-461): with both present, the request value wins
        val lifetime = reqV.orElse(respV).flatMap(seconds)
        lifetime match {
          case None => false
          case Some(l) =>
            h(respHeaders, "Date").flatMap(parseHttpDate).exists { d =>
              l > java.time.Duration.between(d, now).getSeconds
            }
        }
    }
  }

  /** no-store on either side forbids caching (cache/cache.go:491-499). */
  def canStore(reqHeaders: Headers, respHeaders: Headers): Boolean =
    !parseCacheControl(respHeaders).contains("no-store") &&
      !parseCacheControl(reqHeaders).contains("no-store")

  /** Vary matching (cache/cache.go:112-120): the cached response stores each
    * varied request header as `X-Varied-<Name>`; the new request may use the
    * cached entry only if every Vary'd header VALUE equals the stored value
    * — a direct comparison exactly like the reference: an empty stored value
    * matches only an absent/empty request header, and a literal `Vary: *`
    * compares the (absent) `X-Varied-*` against the (absent) `*` request
    * header, i.e. matches.
    */
  def varyMatches(cachedRespHeaders: Headers, reqHeaders: Headers): Boolean =
    varyHeaders(cachedRespHeaders).forall { key =>
      h(cachedRespHeaders, s"X-Varied-$key").getOrElse("") ==
        h(reqHeaders, key).getOrElse("")
    }

  def varyHeaders(respHeaders: Headers): Seq[String] =
    h(respHeaders, "Vary").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** Validator injection for a stale entry (cache/cache.go:210-228): copy
    * the cached ETag to If-None-Match and Last-Modified to
    * If-Modified-Since, unless the caller set them already.
    */
  def addValidators(cachedRespHeaders: Headers, reqHeaders: Headers): Headers = {
    var out = reqHeaders
    h(cachedRespHeaders, "ETag").filter(_.nonEmpty).foreach { etag =>
      if (h(reqHeaders, "etag").isEmpty && h(reqHeaders, "If-None-Match").isEmpty)
        out += "If-None-Match" -> etag
    }
    h(cachedRespHeaders, "Last-Modified").filter(_.nonEmpty).foreach { lm =>
      if (h(reqHeaders, "last-modified").isEmpty &&
        h(reqHeaders, "If-Modified-Since").isEmpty)
        out += "If-Modified-Since" -> lm
    }
    out
  }

  private val HopByHop = Set("connection", "keep-alive", "proxy-authenticate",
    "proxy-authorization", "te", "trailers", "transfer-encoding", "upgrade")

  /** End-to-end headers of a response (cache/cache.go:464-488): everything
    * that isn't hop-by-hop, including headers named by Connection.
    */
  def endToEndHeaders(respHeaders: Headers): Seq[String] = {
    val extra = h(respHeaders, "Connection").toSeq
      .flatMap(_.split(",")).map(_.trim.toLowerCase).filter(_.nonEmpty)
    val hop = HopByHop ++ extra
    respHeaders.keys.filterNot(k => hop.contains(k.toLowerCase)).toSeq
  }

  /** 304 handling (cache/cache.go:232-239): keep the cached response, but
    * overwrite its headers with the 304's end-to-end headers.
    */
  def merge304(cachedRespHeaders: Headers, notModifiedHeaders: Headers): Headers =
    endToEndHeaders(notModifiedHeaders).foldLeft(cachedRespHeaders) { (acc, k) =>
      acc.filterNot(_._1.equalsIgnoreCase(k)) +
        (k -> h(notModifiedHeaders, k).getOrElse(""))
    }

  /** Cache key (cache/cache.go:62-68): plain URL for GET, `METHOD url`
    * otherwise.
    */
  def cacheKey(method: String, url: String): String =
    if (method == "GET") url else s"$method $url"

  /** The full RoundTripRFC2616 serve decision for a corpus-mode fetch
    * (cache/cache.go:182-265 skeleton): given a cached entry (or none) and
    * the request, what should the engine do?
    */
  sealed trait Action
  case object ServeCached extends Action
  final case class Revalidate(withHeaders: Headers) extends Action
  case object FetchAndStore extends Action
  case object FetchNoStore extends Action
  case object GatewayTimeout504 extends Action

  def decide(method: String, reqHeaders: Headers,
      cached: Option[Headers], now: Instant): Action = {
    val cacheable = method == "GET" || method == "HEAD"
    if (!cacheable) return FetchNoStore
    cached match {
      case Some(c) if varyMatches(c, reqHeaders) =>
        getFreshness(c, reqHeaders, now) match {
          case Fresh => ServeCached
          case Stale => Revalidate(addValidators(c, reqHeaders))
          case Transparent => FetchAndStore
        }
      case Some(_) =>
        // entry exists but Vary headers mismatch: the reference stays in
        // the cached-entry branch and performs a REAL transport round trip
        // (cache/cache.go:198-230 — the only-if-cached→504 branch is
        // reached only when cachedResp == nil, i.e. a true cache miss)
        FetchAndStore
      case None =>
        if (parseCacheControl(reqHeaders).contains("only-if-cached"))
          GatewayTimeout504
        else FetchAndStore
    }
  }
}
