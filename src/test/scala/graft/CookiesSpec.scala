package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.pipeline.Cookies

/** RFC 6265 attribute unit coverage (parse / default-path / path-match /
  * header filters) — the e2e wave-clock behavior is pinned in
  * EngineFeaturesSpec's RFC 6265 crawl test.
  */
class CookiesSpec extends AnyFunSuite {

  test("default-path derivation (§5.1.4)") {
    assert(Cookies.defaultPath("/a/b/c") == "/a/b")
    assert(Cookies.defaultPath("/a") == "/")
    assert(Cookies.defaultPath("/") == "/")
    assert(Cookies.defaultPath("") == "/")
    assert(Cookies.defaultPath(null) == "/")
  }

  test("path-match (§5.1.4)") {
    assert(Cookies.pathMatches("/private", "/private"))
    assert(Cookies.pathMatches("/private/x", "/private"))
    assert(Cookies.pathMatches("/private/x", "/private/"))
    assert(!Cookies.pathMatches("/privateX", "/private"))
    assert(!Cookies.pathMatches("/public/b", "/private"))
    assert(Cookies.pathMatches("/anything", "/"))
  }

  test("parse: attributes, Max-Age over Expires, eviction flags") {
    val now = 1000L
    val h = "a.example.com"
    val c1 = Cookies.parse("session=tok; Path=/app; Secure", h, "/x/y", now).get
    assert(c1.name == "session" && c1.value == "tok")
    assert(c1.path == "/app" && c1.secure && c1.expiresAt == -1L && !c1.remove)
    assert(c1.domain == h && c1.hostOnly)
    val c2 = Cookies.parse("a=b", h, "/x/y", now).get
    assert(c2.path == "/x") // default-path
    val c3 = Cookies.parse("a=b; Max-Age=60", h, "/", now).get
    assert(c3.expiresAt == 1060L && !c3.remove)
    val c4 = Cookies.parse("a=b; Max-Age=0", h, "/", now).get
    assert(c4.remove)
    val c5 = Cookies.parse(
      "a=b; Expires=Wed, 21 Oct 2015 07:28:00 GMT", h, "/", now).get
    assert(c5.expiresAt == 1445412480L)
    // Max-Age wins over Expires
    val c6 = Cookies.parse(
      "a=b; Max-Age=5; Expires=Wed, 21 Oct 2015 07:28:00 GMT", h, "/", now).get
    assert(c6.expiresAt == 1005L)
    // invalid date ignored → session cookie
    val c7 = Cookies.parse("a=b; Expires=not-a-date", h, "/", now).get
    assert(c7.expiresAt == -1L)
    assert(Cookies.parse("noequals", h, "/", now).isEmpty)
  }

  test("Domain attribute: normalization, set-time validation, matching") {
    val now = 0L
    // leading dot stripped, lowercased; host must domain-match the attr
    val d1 = Cookies.parse("s=1; Domain=.Example.COM", "a.example.com", "/", now).get
    assert(d1.domain == "example.com" && !d1.hostOnly)
    // exact host == domain is also a valid set
    assert(Cookies.parse("s=1; Domain=example.com", "example.com", "/", now)
      .exists(!_.hostOnly))
    // a host that does NOT domain-match the attribute → cookie rejected
    assert(Cookies.parse("s=1; Domain=other.com", "a.example.com", "/", now).isEmpty)
    // suffix trick must not match: aexample.com is not a subdomain
    assert(Cookies.parse("s=1; Domain=example.com", "aexample.com", "/", now).isEmpty)
    // application matching
    assert(Cookies.domainMatches("b.example.com", "example.com", hostOnly = false))
    assert(Cookies.domainMatches("example.com", "example.com", hostOnly = false))
    assert(!Cookies.domainMatches("b.example.com", "example.com", hostOnly = true))
    assert(!Cookies.domainMatches("bexample.com", "example.com", hostOnly = false))
  }

  test("header: domain/path/secure/expiry filters + Go-jar order") {
    // struct order: name, domain, hostOnly, path, value, secure, expiresAt
    val h = "h.example.com"
    val jar = Seq(
      Row("zeta", h, true, "/", "z", false, -1L),
      Row("alpha", h, true, "/", "a", false, -1L),
      Row("scoped", h, true, "/private", "s", false, -1L),
      Row("sec", h, true, "/", "v", true, -1L),
      Row("dead", h, true, "/", "d", false, 500L),
      Row("dom", "example.com", false, "/", "D", false, -1L),
      Row("other", "other.example.com", true, "/", "o", false, -1L))
    val now = 1000L
    assert(Cookies.header(s"http://$h/x", h, "/x", now, jar) ==
      "alpha=a; dom=D; zeta=z")
    assert(Cookies.header(s"https://$h/x", h, "/x", now, jar) ==
      "alpha=a; dom=D; sec=v; zeta=z")
    // the longest-path cookie leads (RFC 6265 §5.4 step 2 / Go jar order)
    assert(Cookies.header(s"http://$h/private/p", h, "/private/p", now, jar) ==
      "scoped=s; alpha=a; dom=D; zeta=z")
    assert(Cookies.header(s"http://$h/x", h, "/x", 100L, jar) ==
      "alpha=a; dead=d; dom=D; zeta=z") // not yet expired at t=100
    // a sibling host gets ONLY the domain cookie
    assert(Cookies.header("http://b.example.com/x", "b.example.com", "/x",
      now, jar) == "dom=D")
    assert(Cookies.header(s"http://$h/x", h, "/x", now, Nil) == null)
  }

  test("header golden: path-length desc, then creation asc, then name") {
    // 8-field structs carry the creation wave (the jar's c_wave column);
    // Go's net/http/cookiejar sorts selected cookies by path length DESC
    // then creation time ASC — name order only breaks remaining ties
    val h = "shop.example.com"
    val jar = Seq(
      Row("broad", h, true, "/", "b", false, -1L, 0),
      Row("deep", h, true, "/cart/items", "d", false, -1L, 3),
      Row("mid", h, true, "/cart", "m", false, -1L, 1),
      Row("late", h, true, "/", "l", false, -1L, 2))
    val got = Cookies.header(s"http://$h/cart/items/1", h, "/cart/items/1",
      100L, jar)
    assert(got == "deep=d; mid=m; broad=b; late=l")
    // same path length: creation wave breaks the tie before name could
    val jar2 = Seq(
      Row("zz_first", h, true, "/", "1", false, -1L, 0),
      Row("aa_second", h, true, "/", "2", false, -1L, 5))
    assert(Cookies.header(s"http://$h/x", h, "/x", 100L, jar2) ==
      "zz_first=1; aa_second=2")
  }
}
