package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sitemap.Sitemap
import graft.sitemap.Sitemap.Entry

class SitemapSpec extends AnyFunSuite {

  test("writer golden bytes: canonical urlset document") {
    val xml = Sitemap.write(Seq(
      Entry("http://a.example.com/p/1", Some("1997-01-15")),
      Entry("http://a.example.com/p/2", None)))
    val expected =
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "  <url><loc>http://a.example.com/p/1</loc><lastmod>1997-01-15</lastmod></url>\n" +
        "  <url><loc>http://a.example.com/p/2</loc></url>\n" +
        "</urlset>\n"
    assert(xml == expected)
  }

  test("round-trip: parse(write(es)) == es, including entities") {
    val es = Seq(
      Entry("http://h.example.com/q?a=1&b=<2>", Some("2001-09-09")),
      Entry("http://h.example.com/'quote\"", None),
      Entry("http://h.example.com/plain", Some("1997-12-31")))
    assert(Sitemap.parse(Sitemap.write(es)) == es)
  }

  test("<urlset> open tag never parses as a <url> block") {
    // a urlset whose FIRST <loc> appears before any <url> block must not
    // leak into the output
    val xml = "<urlset><loc>http://stray.example.com/</loc>" +
      "<url><loc>http://real.example.com/</loc></url></urlset>"
    // the stray loc sits inside the urlset block scan only if <urlset>
    // matched "<url"; correct parse sees exactly the real entry... but note
    // the stray loc IS inside the first <url> block's preceding text, not a
    // block, so it must be absent.
    assert(Sitemap.parse(xml) == Seq(Entry("http://real.example.com/", None)))
  }

  test("unknown tags ignored; whitespace and attributes tolerated") {
    val xml =
      """<?xml version="1.0"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url >
        |    <loc>  http://w.example.com/a  </loc>
        |    <changefreq>daily</changefreq>
        |    <priority>0.8</priority>
        |    <lastmod> 2004-10-01 </lastmod>
        |  </url>
        |</urlset>""".stripMargin
    assert(Sitemap.parse(xml) ==
      Seq(Entry("http://w.example.com/a", Some("2004-10-01"))))
  }

  test("blocks without <loc> dropped; truncated trailing block dropped") {
    val xml = "<urlset>" +
      "<url><lastmod>2000-01-01</lastmod></url>" + // no loc → dropped
      "<url><loc>http://ok.example.com/</loc></url>" +
      "<url><loc>http://cut.example.com/</loc>" // no </url> → dropped
    assert(Sitemap.parse(xml) == Seq(Entry("http://ok.example.com/", None)))
  }

  test("empty and garbage inputs parse to no entries") {
    assert(Sitemap.parse("") == Nil)
    assert(Sitemap.parse("not xml at all") == Nil)
    assert(Sitemap.parse("<urlset></urlset>") == Nil)
  }

  test("index: write → parseIndex round-trips shard pointers in order") {
    val shards = Seq(
      Entry("http://h1.example.com/sitemap-0.xml", Some("2024-01-01")),
      Entry("http://h1.example.com/sitemap-1.xml", None),
      Entry("http://h1.example.com/sitemap-2.xml", None))
    val xml = Sitemap.writeIndex(shards)
    assert(xml.startsWith("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<sitemapindex"))
    assert(Sitemap.parseIndex(xml) == shards)
  }

  test("index: <sitemapindex> root never false-matches a <sitemap> block") {
    // a root tag and an empty index must yield zero pointers, and a block
    // missing <loc> is dropped exactly like the urlset side
    assert(Sitemap.parseIndex("<sitemapindex></sitemapindex>") == Nil)
    assert(Sitemap.parseIndex(
      "<sitemapindex><sitemap><lastmod>2024-01-01</lastmod></sitemap></sitemapindex>") == Nil)
  }

  test("index: urlset parser and index parser do not cross-match blocks") {
    val index = Sitemap.writeIndex(Seq(Entry("http://h/s-0.xml", None)))
    val urlset = Sitemap.write(Seq(Entry("http://h/p/1", None)))
    assert(Sitemap.parse(index) == Nil)      // no <url> blocks in an index
    assert(Sitemap.parseIndex(urlset) == Nil) // no <sitemap> blocks in a urlset
  }

  test("index: truncated trailing <sitemap> block dropped") {
    val xml = "<sitemapindex>" +
      "<sitemap><loc>http://h/s-0.xml</loc></sitemap>" +
      "<sitemap><loc>http://h/s-1.xml</loc>" // no close → dropped
    assert(Sitemap.parseIndex(xml) == Seq(Entry("http://h/s-0.xml", None)))
  }
}
