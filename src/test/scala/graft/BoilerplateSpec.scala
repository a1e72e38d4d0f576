package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.Boilerplate

/** Link-density boilerplate removal (graft.html.Boilerplate) — the generic
  * main-content extractor behind q72. Pins the density arithmetic, the
  * body-block segmentation, and the classification edge cases the q72
  * fixture exercises at corpus scale.
  */
class BoilerplateSpec extends AnyFunSuite {

  private val page =
    """<html><head><title>p</title></head><body>
      |<div class="nav"><a href="/">home</a> <a href="/about">about</a> <a href="/p/7">more</a></div>
      |<p>order F priority 1-URGENT total 12345</p>
      |<div>read more from <a href="/p/8">here</a> after the jump</div>
      |<div class="footer"><a href="/terms">terms</a> <a href="/privacy">privacy</a></div>
      |</body></html>""".stripMargin.linesIterator.mkString("")

  test("fixture page: nav and footer dropped, prose blocks kept in order") {
    val main = Boilerplate.mainContent(page)
    assert(main ==
      "order F priority 1-URGENT total 12345\nread more from here after the jump")
  }

  test("block accounting: 4 blocks, densities bracket the 0.5 threshold") {
    val bs = Boilerplate.blocks(page)
    assert(bs.length == 4)
    assert(bs.map(_.tag) == Seq("div", "p", "div", "div"))
    // nav: anchors 4+5+4 of "home about more" (15 chars)
    assert(bs(0).anchorChars == 13 && bs(0).totalChars == 15)
    assert(bs(0).linkDensity > 0.5)
    assert(bs(1).linkDensity == 0.0)
    // mixed prose: one inline link must NOT make the block boilerplate
    assert(bs(2).anchorChars == 4)
    assert(bs(2).linkDensity < 0.5)
    assert(bs(3).linkDensity > 0.5)
  }

  test("nested anchors count once (no double-counted chars)") {
    val bs = Boilerplate.blocks(
      "<body><div><a href='/'>ab<span><a href='/x'>cd</a></span></a>efgh</div></body>")
    assert(bs.length == 1)
    assert(bs.head.totalChars == 8)
    assert(bs.head.anchorChars == 4) // ab + cd, each once
    assert(bs.head.linkDensity == 0.5)
  }

  test("threshold is inclusive: density exactly 0.5 is kept") {
    val html = "<body><div><a href='/'>abcd</a>efgh</div></body>"
    assert(Boilerplate.mainContent(html) == "abcdefgh")
    assert(Boilerplate.mainContent(html, maxLinkDensity = 0.49) == "")
  }

  test("no <body>: top-level blocks come from the document root") {
    val bs = Boilerplate.blocks("<div>plain text block</div><div><a href='/'>all link</a></div>")
    assert(bs.length == 2)
    assert(Boilerplate.mainContent(
      "<div>plain text block</div><div><a href='/'>all link</a></div>") ==
      "plain text block")
  }

  test("script/style/template/noscript never contribute blocks") {
    val html =
      """<body><script>var x = 'looks like content';</script>
        |<style>.a { color: red }</style>
        |<p>real text</p><noscript>enable js</noscript></body>"""
        .stripMargin.linesIterator.mkString("")
    val bs = Boilerplate.blocks(html)
    assert(bs.map(_.tag) == Seq("p"))
    assert(Boilerplate.mainContent(html) == "real text")
  }

  test("whitespace-only and empty blocks are dropped from main content") {
    assert(Boilerplate.mainContent("<body><div>   </div><p>x</p><div></div></body>") == "x")
  }

  test("an empty block has link density 1.0 (never content)") {
    assert(Boilerplate.blocks("<body><div></div></body>").head.linkDensity == 1.0)
  }
}
