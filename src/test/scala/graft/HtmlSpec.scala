package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{Css, HtmlParser}

class HtmlSpec extends AnyFunSuite {

  private val quotePage =
    """<!DOCTYPE html>
      |<html lang="en"><head><title>Quotes to Scrape</title></head>
      |<body>
      |<div class="container">
      |  <div class="quote" itemscope itemtype="http://schema.org/CreativeWork">
      |    <span class="text" itemprop="text">&ldquo;The world as we have created it is a process of our thinking.&rdquo;</span>
      |    <span>by <small class="author" itemprop="author">Albert Einstein</small></span>
      |    <div class="tags">
      |      Tags:
      |      <a class="tag" href="/tag/change/page/1/">change</a>
      |      <a class="tag" href="/tag/deep-thoughts/page/1/">deep-thoughts</a>
      |    </div>
      |  </div>
      |  <div class="quote">
      |    <span class="text">&ldquo;It is our choices, Harry.&rdquo;</span>
      |    <span>by <small class="author">J.K. Rowling</small></span>
      |    <div class="tags">
      |      <a class="tag" href="/tag/abilities/page/1/">abilities</a>
      |    </div>
      |  </div>
      |  <nav><ul class="pager">
      |    <li class="next"><a href="/page/2/">Next <span aria-hidden="true">&rarr;</span></a></li>
      |  </ul></nav>
      |</div>
      |</body></html>""".stripMargin

  test("quote extraction matches reference parse semantics (geziyor_test.go:76-94)") {
    val doc = Css.doc(quotePage)
    val quotes = doc.find("div.quote")
    assert(quotes.size == 2)
    val first = quotes.each { (i, s) =>
      (i, s.find("span.text").text, s.find("small.author").text,
        s.find("div.tags > a.tag").map(_.text))
    }
    assert(first(0) == ((0,
      "“The world as we have created it is a process of our thinking.”",
      "Albert Einstein", Seq("change", "deep-thoughts"))))
    assert(first(1) == ((1, "“It is our choices, Harry.”",
      "J.K. Rowling", Seq("abilities"))))
  }

  test("li.next > a href extraction (pagination)") {
    val doc = Css.doc(quotePage)
    assert(doc.find("li.next > a").attr("href").contains("/page/2/"))
  }

  test("find('a') returns all anchors in document order") {
    val doc = Css.doc(quotePage)
    val hrefs = doc.find("a").map(_.attr("href").getOrElse(""))
    assert(hrefs == Seq("/tag/change/page/1/", "/tag/deep-thoughts/page/1/",
      "/tag/abilities/page/1/", "/page/2/"))
  }

  test("child combinator is strict: div.tags > a.tag excludes deeper anchors") {
    val html =
      """<div class="tags"><a class="tag" href="1">one</a>
        |<span><a class="tag" href="2">two</a></span></div>""".stripMargin
    val sel = Css.doc(html).find("div.tags > a.tag")
    assert(sel.map(_.attr("href").getOrElse("")) == Seq("1"))
    assert(Css.doc(html).find("div.tags a.tag").size == 2)
  }

  test("Text() concatenates descendant text nodes in document order") {
    val html = "<div>a<span>b<i>c</i></span>d</div>"
    assert(Css.doc(html).find("div").text == "abcd")
  }

  test("entity decoding: named, decimal, hex; unknown passes through") {
    assert(HtmlParser.decodeEntities("&amp;&lt;&gt;&quot;&#39;&#x41;&#66;") ==
      "&<>\"'AB")
    assert(HtmlParser.decodeEntities("a &unknown; b") == "a &unknown; b")
    assert(HtmlParser.decodeEntities("fish &amp chips") == "fish &amp chips")
  }

  test("void and self-closing elements don't break nesting") {
    val html = "<p>a<br>b<img src=\"x.png\">c<hr/>d</p><p>e</p>"
    val ps = Css.doc(html).find("p")
    assert(ps.size == 2)
    assert(ps.nodes.head.text == "abcd")
  }

  test("script/style raw text is not parsed as markup") {
    val html = "<div><script>if (a < b) { x = \"<span>\"; }</script><p>t</p></div>"
    val doc = Css.doc(html)
    assert(doc.find("span").isEmpty)
    assert(doc.find("p").text == "t")
  }

  test("comments and doctype are skipped") {
    val html = "<!DOCTYPE html><!-- <p>no</p> --><p>yes</p>"
    assert(Css.doc(html).find("p").text == "yes")
  }

  test("unquoted and single-quoted attributes") {
    val html = "<a href=/x class='tag big'>t</a>"
    val a = Css.doc(html).find("a.tag.big")
    assert(a.attr("href").contains("/x"))
  }

  test("lenient recovery: stray close tags are ignored") {
    val html = "<div><p>a</span></p>b</div>"
    assert(Css.doc(html).find("div").text == "ab")
  }

  test("attribute selectors") {
    val html = """<a href="x" rel="nofollow">1</a><a href="y">2</a>"""
    assert(Css.doc(html).find("a[rel]").text == "1")
    assert(Css.doc(html).find("a[href=y]").text == "2")
  }
}
