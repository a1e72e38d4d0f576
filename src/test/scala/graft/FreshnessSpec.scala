package graft

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant
import graft.rfc2616.Freshness
import graft.rfc2616.Freshness._

/** Fake-clock conformance tests mirroring the reference suite's scenarios
  * (cache/cache_test.go: TestGetFreshness / TestMaxAge / TestExpires /
  * TestVary / TestStaleIfError / Test304 shapes).
  */
class FreshnessSpec extends AnyFunSuite {

  private val t0 = Instant.parse("2023-06-01T00:00:00Z")
  private def at(secs: Long) = t0.plusSeconds(secs)
  private def dated(extra: (String, String)*): Headers =
    (Seq("Date" -> formatHttpDate(t0)) ++ extra).toMap

  test("request no-cache → transparent; response no-cache → stale") {
    assert(getFreshness(dated(), Map("Cache-Control" -> "no-cache"), at(0)) ==
      Transparent)
    assert(getFreshness(dated("Cache-Control" -> "no-cache"), Map.empty, at(0)) ==
      Stale)
  }

  test("only-if-cached request → fresh; missing Date → stale") {
    assert(getFreshness(dated(), Map("Cache-Control" -> "only-if-cached"),
      at(0)) == Fresh)
    assert(getFreshness(Map.empty, Map.empty, at(0)) == Stale)
  }

  test("max-age lifetime, stepped by fake clock") {
    val resp = dated("Cache-Control" -> "max-age=60")
    assert(getFreshness(resp, Map.empty, at(0)) == Fresh)
    assert(getFreshness(resp, Map.empty, at(59)) == Fresh)
    assert(getFreshness(resp, Map.empty, at(60)) == Stale)   // lifetime > age strict
    assert(getFreshness(resp, Map.empty, at(3600)) == Stale)
  }

  test("Expires drives lifetime when max-age absent; max-age overrides Expires") {
    val respExp = dated("Expires" -> formatHttpDate(at(120)))
    assert(getFreshness(respExp, Map.empty, at(100)) == Fresh)
    assert(getFreshness(respExp, Map.empty, at(120)) == Stale)
    val both = dated("Cache-Control" -> "max-age=10",
      "Expires" -> formatHttpDate(at(120)))
    assert(getFreshness(both, Map.empty, at(50)) == Stale) // max-age wins
  }

  test("request max-age overrides response lifetime") {
    val resp = dated("Cache-Control" -> "max-age=3600")
    assert(getFreshness(resp, Map("Cache-Control" -> "max-age=10"), at(30)) ==
      Stale)
  }

  test("min-fresh inflates age; max-stale deflates; valueless max-stale → always fresh") {
    val resp = dated("Cache-Control" -> "max-age=60")
    assert(getFreshness(resp, Map("Cache-Control" -> "min-fresh=30"), at(40)) ==
      Stale)  // 40+30 >= 60
    assert(getFreshness(resp, Map("Cache-Control" -> "min-fresh=10"), at(40)) ==
      Fresh)  // 40+10 < 60
    assert(getFreshness(resp, Map("Cache-Control" -> "max-stale=100"), at(120)) ==
      Fresh)  // 120-100 < 60
    assert(getFreshness(resp, Map("Cache-Control" -> "max-stale"), at(9999)) ==
      Fresh)
  }

  test("stale-if-error: valueless always; valued bounded by age (RFC 5861)") {
    assert(canStaleOnError(dated("Cache-Control" -> "stale-if-error"),
      Map.empty, at(99999)))
    val valued = dated("Cache-Control" -> "stale-if-error=100")
    assert(canStaleOnError(valued, Map.empty, at(99)))
    assert(!canStaleOnError(valued, Map.empty, at(100)))
    assert(canStaleOnError(dated(), Map("Cache-Control" -> "stale-if-error=50"),
      at(10)))
    assert(!canStaleOnError(Map.empty, Map.empty, at(0)))
  }

  test("no-store on either side forbids caching") {
    assert(!canStore(Map("Cache-Control" -> "no-store"), Map.empty))
    assert(!canStore(Map.empty, Map("Cache-Control" -> "no-store")))
    assert(canStore(Map.empty, Map.empty))
  }

  test("vary matching: direct value comparison, exactly like cache.go:112-120") {
    val cached = dated("Vary" -> "Accept", "X-Varied-Accept" -> "text/plain")
    assert(varyMatches(cached, Map("Accept" -> "text/plain")))
    assert(!varyMatches(cached, Map("Accept" -> "text/html")))
    // reference compares header VALUES directly: `Vary: *` stores no
    // X-Varied-* (""), request has no "*" header ("") → match
    assert(varyMatches(dated("Vary" -> "*"), Map.empty))
    // empty stored value matches ONLY an absent/empty request header
    val emptyStored = dated("Vary" -> "Accept", "X-Varied-Accept" -> "")
    assert(varyMatches(emptyStored, Map.empty))
    assert(!varyMatches(emptyStored, Map("Accept" -> "text/html")))
    // double vary: all must match
    val dbl = dated("Vary" -> "Accept, Accept-Language",
      "X-Varied-Accept" -> "a", "X-Varied-Accept-Language" -> "da")
    assert(varyMatches(dbl, Map("Accept" -> "a", "Accept-Language" -> "da")))
    assert(!varyMatches(dbl, Map("Accept" -> "a", "Accept-Language" -> "en")))
  }

  test("decide: vary-mismatch entry does a real fetch even under only-if-cached") {
    // cache.go:198-230 — with an entry present but Vary mismatched, the
    // reference stays in the cached branch and calls transport.RoundTrip;
    // the 504 short-circuit fires only on a TRUE cache miss
    val cached = dated("Vary" -> "Accept", "X-Varied-Accept" -> "text/plain")
    val oic: Headers = Map("Cache-Control" -> "only-if-cached",
      "Accept" -> "text/html")
    assert(decide("GET", oic, Some(cached), at(0)) == FetchAndStore)
    assert(decide("GET", oic, None, at(0)) == GatewayTimeout504)
  }

  test("unparseable response max-age → lifetime 0, no Expires fallback (cache.go:365-376)") {
    val resp = dated("Cache-Control" -> "max-age=banana",
      "Expires" -> formatHttpDate(at(9999)))
    assert(getFreshness(resp, Map.empty, at(0)) == Stale)
  }

  test("stale-if-error: request directive applied last wins over response") {
    val resp = dated("Cache-Control" -> "stale-if-error=1000")
    val req: Headers = Map("Cache-Control" -> "stale-if-error=10")
    assert(!canStaleOnError(resp, req, at(500)))  // req bound 10 < age 500
    assert(canStaleOnError(resp, Map.empty, at(500))) // resp bound alone ok
  }

  test("validator injection: ETag → If-None-Match, Last-Modified → If-Modified-Since") {
    val cached = dated("ETag" -> "\"v1\"", "Last-Modified" -> formatHttpDate(t0))
    val out = addValidators(cached, Map.empty)
    assert(out("If-None-Match") == "\"v1\"")
    assert(out("If-Modified-Since") == formatHttpDate(t0))
    // caller-set validators are not overwritten
    val kept = addValidators(cached, Map("If-None-Match" -> "\"mine\""))
    assert(kept("If-None-Match") == "\"mine\"")
  }

  test("304 merge keeps cached entity, updates end-to-end headers, drops hop-by-hop") {
    val cached = dated("ETag" -> "\"v1\"", "Content-Type" -> "text/html")
    val nm: Headers = Map("Date" -> formatHttpDate(at(100)),
      "Connection" -> "keep-alive, X-Custom", "X-Custom" -> "zzz",
      "Keep-Alive" -> "timeout=5", "ETag" -> "\"v1\"")
    val merged = merge304(cached, nm)
    assert(merged("Date") == formatHttpDate(at(100)))     // updated
    assert(merged("Content-Type") == "text/html")          // kept
    assert(!merged.contains("Keep-Alive"))                 // hop-by-hop dropped
    assert(!merged.contains("X-Custom"))                   // named in Connection
  }

  test("cache key: GET → url; other methods prefixed (cache/cache.go:62-68)") {
    assert(cacheKey("GET", "http://x/y") == "http://x/y")
    assert(cacheKey("HEAD", "http://x/y") == "HEAD http://x/y")
  }

  test("decide: the RoundTripRFC2616 skeleton") {
    val freshCached = dated("Cache-Control" -> "max-age=60")
    assert(decide("GET", Map.empty, Some(freshCached), at(10)) == ServeCached)
    decide("GET", Map.empty, Some(dated("ETag" -> "\"e\"")), at(10)) match {
      case Revalidate(h) => assert(h("If-None-Match") == "\"e\"")
      case other => fail(s"want Revalidate, got $other")
    }
    assert(decide("POST", Map.empty, None, at(0)) == FetchNoStore)
    assert(decide("GET", Map("Cache-Control" -> "only-if-cached"), None,
      at(0)) == GatewayTimeout504)
    assert(decide("GET", Map.empty, None, at(0)) == FetchAndStore)
    // vary mismatch → ignore cached entry entirely
    val varied = dated("Cache-Control" -> "max-age=999", "Vary" -> "Accept",
      "X-Varied-Accept" -> "text/plain")
    assert(decide("GET", Map("Accept" -> "text/html"), Some(varied), at(0)) ==
      FetchAndStore)
  }

  test("parseCacheControl: quoted values, spacing, valueless tokens") {
    val cc = parseCacheControl(Map(
      "Cache-Control" -> """max-age="60", no-store ,  min-fresh=5"""))
    assert(cc == Map("max-age" -> "60", "no-store" -> "", "min-fresh" -> "5"))
  }
}
