package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.url.UrlOps

class UrlSpec extends AnyFunSuite {
  // deterministic property sampling (no scalatestplus bridge in the offline cache)
  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  // RFC 3986 §5.4.1 normal examples (Go net/url passes all of these).
  private val base = "http://a/b/c/d;p?q"
  private val normal = Seq(
    "g:h" -> "g:h",
    "g" -> "http://a/b/c/g",
    "./g" -> "http://a/b/c/g",
    "g/" -> "http://a/b/c/g/",
    "/g" -> "http://a/g",
    "//g" -> "http://g",
    "?y" -> "http://a/b/c/d;p?y",
    "g?y" -> "http://a/b/c/g?y",
    ";x" -> "http://a/b/c/;x",
    "g;x" -> "http://a/b/c/g;x",
    "" -> "http://a/b/c/d;p?q",
    "." -> "http://a/b/c/",
    "./" -> "http://a/b/c/",
    ".." -> "http://a/b/",
    "../" -> "http://a/b/",
    "../g" -> "http://a/b/g",
    "../.." -> "http://a/",
    "../../" -> "http://a/",
    "../../g" -> "http://a/g")

  // §5.4.2 abnormal examples (strict resolver)
  private val abnormal = Seq(
    "../../../g" -> "http://a/g",
    "../../../../g" -> "http://a/g",
    "/./g" -> "http://a/g",
    "/../g" -> "http://a/g",
    "g." -> "http://a/b/c/g.",
    ".g" -> "http://a/b/c/.g",
    "g.." -> "http://a/b/c/g..",
    "..g" -> "http://a/b/c/..g",
    "./../g" -> "http://a/b/g",
    "./g/." -> "http://a/b/c/g/",
    "g/./h" -> "http://a/b/c/g/h",
    "g/../h" -> "http://a/b/c/h",
    "g;x=1/./y" -> "http://a/b/c/g;x=1/y",
    "g;x=1/../y" -> "http://a/b/c/y",
    "http:g" -> "http:g")

  test("RFC 3986 §5.4.1 normal resolution examples") {
    val b = UrlOps.parse(base)
    normal.foreach { case (ref, want) =>
      assert(UrlOps.resolve(b, UrlOps.parse(ref)).toString == want, s"ref=$ref")
    }
  }

  test("RFC 3986 §5.4.2 abnormal resolution examples") {
    val b = UrlOps.parse(base)
    abnormal.foreach { case (ref, want) =>
      assert(UrlOps.resolve(b, UrlOps.parse(ref)).toString == want, s"ref=$ref")
    }
  }

  test("fragment handling: resolveLink drops fragments for frontier keys") {
    assert(UrlOps.resolveLink("http://a/b/c", "#s") == "http://a/b/c")
    assert(UrlOps.resolveLink("http://a/b/", "g#s?x=1") == "http://a/b/g")
  }

  test("crawl-realistic links (quotes fixture shapes)") {
    assert(UrlOps.resolveLink("http://quotes.toscrape.com/", "/page/2/") ==
      "http://quotes.toscrape.com/page/2/")
    assert(UrlOps.resolveLink("http://quotes.toscrape.com/page/2/", "/page/3/") ==
      "http://quotes.toscrape.com/page/3/")
    assert(UrlOps.resolveLink("http://books.toscrape.com/index.html",
      "catalogue/category/books/travel_2/index.html") ==
      "http://books.toscrape.com/catalogue/category/books/travel_2/index.html")
    assert(UrlOps.resolveLink("http://books.toscrape.com/catalogue/a/index.html",
      "../../index.html") == "http://books.toscrape.com/index.html")
    assert(UrlOps.resolveLink("http://x.com/a", "http://y.com/b") ==
      "http://y.com/b")
  }

  test("host/path extraction") {
    assert(UrlOps.hostOf("http://quotes.toscrape.com/page/2/") ==
      "quotes.toscrape.com")
    assert(UrlOps.hostOf("http://user@host.com:8080/x") == "host.com")
    assert(UrlOps.pathOf("http://h.com") == "/")
    assert(UrlOps.pathOf("http://h.com/p/1?q=2") == "/p/1")
  }

  test("property: resolving an absolute URL against any base is identity (modulo dot-segments)") {
    val absGen = for {
      h <- Gen.alphaLowerStr.suchThat(_.nonEmpty)
      p <- Gen.listOf(Gen.alphaNumStr.suchThat(_.nonEmpty)).map(_.take(4))
    } yield s"http://$h.com/${p.mkString("/")}"
    for (b <- samples(absGen, 50); r <- samples(absGen, 10)) {
      assert(UrlOps.resolveLink(b, r) == r)
    }
  }

  test("property: resolve result is always absolute when base is absolute") {
    val refGen = Gen.oneOf("a", "./b", "../c", "/d", "e/f", "?g=1", "", "#h")
    samples(refGen).foreach { ref =>
      val out = UrlOps.resolveLink("http://base.example.com/x/y/z", ref)
      assert(out.startsWith("http://"))
    }
  }

  test("canonicalize: RFC 3986 §6.2 safe normalizations") {
    val c = UrlOps.canonicalize _
    assert(c("HTTP://Example.COM:80/a/../b#f") == "http://example.com/b")
    assert(c("https://Example.com:443/x") == "https://example.com/x")
    assert(c("https://example.com:8443/x") == "https://example.com:8443/x")
    assert(c("http://example.com") == "http://example.com/")   // "" → "/"
    assert(c("http://example.com/./p/") == "http://example.com/p/")
    assert(c("http://u:p@Host.com:80/q?a=1#z") == "http://u:p@host.com/q?a=1")
    assert(c("http://[::1]:80/v6") == "http://[::1]/v6")       // port stripped
    assert(c("http://[::1]:8080/v6") == "http://[::1]:8080/v6")
    // query is NOT touched (server-observable), case of path preserved
    assert(c("http://example.com/CaSe?B=2&A=1") == "http://example.com/CaSe?B=2&A=1")
    // idempotent
    val u = "HTTP://A.B:80/./x/../y#q"
    assert(c(c(u)) == c(u))
  }
}
