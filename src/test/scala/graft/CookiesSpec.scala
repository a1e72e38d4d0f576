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
    val c1 = Cookies.parse("session=tok; Path=/app; Secure", "/x/y", now).get
    assert(c1.name == "session" && c1.value == "tok")
    assert(c1.path == "/app" && c1.secure && c1.expiresAt == -1L && !c1.remove)
    val c2 = Cookies.parse("a=b", "/x/y", now).get
    assert(c2.path == "/x") // default-path
    val c3 = Cookies.parse("a=b; Max-Age=60", "/", now).get
    assert(c3.expiresAt == 1060L && !c3.remove)
    val c4 = Cookies.parse("a=b; Max-Age=0", "/", now).get
    assert(c4.remove)
    val c5 = Cookies.parse(
      "a=b; Expires=Wed, 21 Oct 2015 07:28:00 GMT", "/", now).get
    assert(c5.expiresAt == 1445412480L)
    // Max-Age wins over Expires
    val c6 = Cookies.parse(
      "a=b; Max-Age=5; Expires=Wed, 21 Oct 2015 07:28:00 GMT", "/", now).get
    assert(c6.expiresAt == 1005L)
    // invalid date ignored → session cookie
    val c7 = Cookies.parse("a=b; Expires=not-a-date", "/", now).get
    assert(c7.expiresAt == -1L)
    assert(Cookies.parse("noequals", "/", now).isEmpty)
  }

  test("header: path/secure/expiry filters + name-sorted name=value") {
    val jar = Seq(
      Row("zeta", "/", "z", false, -1L),
      Row("alpha", "/", "a", false, -1L),
      Row("scoped", "/private", "s", false, -1L),
      Row("sec", "/", "v", true, -1L),
      Row("dead", "/", "d", false, 500L))
    val now = 1000L
    assert(Cookies.header("http://h/x", "/x", now, jar) == "alpha=a; zeta=z")
    assert(Cookies.header("https://h/x", "/x", now, jar) ==
      "alpha=a; sec=v; zeta=z")
    assert(Cookies.header("http://h/private/p", "/private/p", now, jar) ==
      "alpha=a; scoped=s; zeta=z")
    assert(Cookies.header("http://h/x", "/x", 100L, jar) ==
      "alpha=a; dead=d; zeta=z") // not yet expired at t=100
    assert(Cookies.header("http://h/x", "/x", now, Nil) == null)
  }
}
