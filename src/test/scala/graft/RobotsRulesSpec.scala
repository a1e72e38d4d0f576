package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.RobotsRules
import graft.pipeline.RobotsRules.{Rule, allowed, matches, parse}

/** Full REP matching (RFC 9309 / temoto/robotstxt semantics — the
  * reference's library at middleware/robotstxt.go:63): group selection by
  * longest UA-prefix, Allow/Disallow longest-match with Allow winning
  * ties, `*` wildcards, `$` end anchors, FromStatusAndBytes status map.
  */
class RobotsRulesSpec extends AnyFunSuite {

  test("wildcard + anchor pattern matching") {
    assert(matches("/p/1", "/p/1"))
    assert(matches("/p/123", "/p/1"))      // prefix
    assert(!matches("/q/1", "/p/1"))
    assert(matches("/p/1", "/p/1$"))       // exact via anchor
    assert(!matches("/p/12", "/p/1$"))
    assert(matches("/a/x/b", "/a/*/b"))
    assert(matches("/a/x/b/c", "/a/*/b"))  // still prefix after glob
    assert(!matches("/a/x/c", "/a/*/b"))
    assert(matches("/fish.php?id=7", "/*.php"))
    assert(matches("/x.php", "/*.php$"))
    assert(!matches("/x.php?y", "/*.php$")) // anchored
    assert(matches("/anything", "/*"))
    assert(matches("/anything", ""))        // empty pattern matches all
    assert(matches("/a7b", "/a*7"))
    assert(!matches("/ab", "/a*7"))
    // final literal under $ must sit at the END, not just anywhere
    assert(matches("/ab7", "/a*7$"))
    assert(!matches("/a7b", "/a*7$"))
  }

  test("longest-match wins; Allow wins ties; no match allows") {
    val rules = Seq(Rule("/p/", allow = false), Rule("/p/public", allow = true))
    assert(!allowed("/p/secret", rules))
    assert(allowed("/p/public/x", rules))  // longer Allow overrides
    assert(allowed("/other", rules))       // no rule → allowed
    // exact tie → allow (least restrictive)
    val tie = Seq(Rule("/x", allow = false), Rule("/x", allow = true))
    assert(allowed("/x/1", tie))
  }

  test("group selection: longest agent prefix, * fallback, merged groups") {
    val body =
      """User-agent: googlebot
        |Disallow: /gb
        |
        |User-agent: googlebot-images
        |Disallow: /img
        |
        |User-agent: *
        |Disallow: /all
        |""".stripMargin
    // UA "googlebot-images/1.0" matches BOTH googlebot + googlebot-images
    // tokens — the longer one wins
    assert(parse(body, "Googlebot-Images/1.0") == Seq(Rule("/img", false)))
    assert(parse(body, "googlebot-news") == Seq(Rule("/gb", false)))
    assert(parse(body, "SomeOtherBot") == Seq(Rule("/all", false)))
    // consecutive User-agent lines share one rule group
    val shared =
      """User-agent: a
        |User-agent: b
        |Disallow: /shared
        |""".stripMargin
    assert(parse(shared, "a/1") == Seq(Rule("/shared", false)))
    assert(parse(shared, "b/1") == Seq(Rule("/shared", false)))
  }

  test("empty Disallow means nothing disallowed; comments stripped") {
    val body =
      """# global policy
        |User-agent: *   # everyone
        |Disallow:
        |Allow: /ok
        |""".stripMargin
    val rules = parse(body, "anybot")
    assert(rules == Seq(Rule("/ok", true)))
    assert(allowed("/anything", rules))
  }

  test("FromStatusAndBytes: 2xx parse, 4xx allow-all, 5xx disallow-all") {
    val body = "User-agent: *\nDisallow: /x\n"
    assert(RobotsRules.fromStatus(200, body, "bot") == Seq(Rule("/x", false)))
    assert(RobotsRules.fromStatus(404, body, "bot").isEmpty)
    assert(RobotsRules.fromStatus(403, body, "bot").isEmpty)
    val srv = RobotsRules.fromStatus(503, body, "bot")
    assert(!allowed("/anything", srv))
    assert(!allowed("/", srv))
  }

  test("Crawl-delay: per-group, fractional, invalid ignored") {
    val body =
      """User-agent: fastbot
        |Crawl-delay: 0.25
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 2.5
        |""".stripMargin
    assert(RobotsRules.group(body, "fastbot/1.0").crawlDelay.contains(0.25))
    assert(RobotsRules.group(body, "otherbot").crawlDelay.contains(2.5))
    assert(RobotsRules.group("User-agent: *\nCrawl-delay: nope\n", "b")
      .crawlDelay.isEmpty)
    assert(RobotsRules.group("User-agent: *\nDisallow: /x\n", "b")
      .crawlDelay.isEmpty)
    // rules unaffected by the delay directive
    assert(RobotsRules.parse(body, "fastbot/1.0") == Seq(Rule("/x", false)))
  }

  test("reference fixture subset still behaves (Disallow prefix group)") {
    val body = "User-agent: *\nDisallow: /deny\n"
    val rules = parse(body, graft.model.CrawlSpec.DefaultUserAgent)
    assert(!allowed("/deny", rules))
    assert(!allowed("/deny/page", rules))
    assert(allowed("/page/1", rules))
  }

  test("sitemaps: file-wide, group-independent, case-insensitive, " +
    "comments stripped, empties dropped, duplicates kept in file order") {
    val body =
      """# header comment
        |Sitemap: http://a.example.com/s1.xml
        |User-agent: googlebot
        |Disallow: /x
        |SITEMAP: http://a.example.com/s2.xml  # trailing comment
        |User-agent: *
        |sitemap:http://a.example.com/s3.xml
        |Sitemap:
        |Sitemap: http://a.example.com/s1.xml
        |NotASitemap: http://nope.example.com/
        |""".stripMargin
    assert(RobotsRules.sitemaps(body) == Seq(
      "http://a.example.com/s1.xml",
      "http://a.example.com/s2.xml",
      "http://a.example.com/s3.xml",
      "http://a.example.com/s1.xml"))
    // a Sitemap line does NOT leak rules into any group, and group
    // selection is unaffected (it closes the agent run like any unknown
    // directive — temoto/robotstxt parity)
    assert(RobotsRules.parse(body, "googlebot") == Seq(Rule("/x", false)))
    assert(RobotsRules.parse(body, "other").isEmpty)
    assert(RobotsRules.sitemaps("") == Seq.empty)
    assert(RobotsRules.sitemaps("User-agent: *\nDisallow: /\n") == Seq.empty)
  }
}
