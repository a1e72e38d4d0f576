package graft.pipeline

import graft.html.Css
import graft.sinks.{JArr, JInt, JObj, JStr, Json, JsonValue}
import graft.url.UrlOps

/** A discovered child request: absolute URL + the parser that will handle
  * its response (the reference passes a callback to g.Get; callbacks become
  * registered parser ids because closures don't live in a frontier table —
  * SURVEY.md §3.2).
  */
final case class Discovered(url: String, parserId: String)

final case class ParseOutput(
    records: Seq[String],          // compact-JSON record per export (Go map-marshal byte format)
    links: Seq[Discovered])

/** A registered ParseFunc analog. Implementations must be deterministic and
  * serializable (they run executor-side inside the parse stage).
  */
trait Parser extends Serializable {
  def id: String
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput
  protected def rec(v: JsonValue): String = Json.compact(v)
}

/** The canonical quotes parser (geziyor_test.go:76-94): per div.quote emit
  * {number, text, author, tags}; follow li.next > a.
  */
object QuotesParser extends Parser {
  val id = "quotes"
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput = {
    if (!isHtml) return ParseOutput(Nil, Nil)
    val doc = Css.doc(html)
    val records = doc.find("div.quote").each { (i, s) =>
      rec(JObj(Seq(
        "number" -> JInt(i.toLong),
        "text" -> JStr(s.find("span.text").text),
        "author" -> JStr(s.find("small.author").text),
        "tags" -> JArr(s.find("div.tags > a.tag").map(t => JStr(t.text))))))
    }
    val links = doc.find("li.next > a").attr("href").toSeq
      .map(href => Discovered(UrlOps.resolveLink(url, href), id))
    ParseOutput(records, links)
  }
}

/** Whole-site BFS parser (geziyor_test.go:96-116): export the visited URL,
  * follow every anchor.
  */
object AllLinksParser extends Parser {
  val id = "all_links"
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput = {
    val records = Seq(rec(JArr(Seq(JStr(url)))))
    val links =
      if (!isHtml) Nil
      else Css.doc(html).find("a").nodes.flatMap(_.attr("href"))
        .map(href => Discovered(UrlOps.resolveLink(url, href), id))
    ParseOutput(records, links)
  }
}

/** Href exporter (geziyor_test.go:118-130): export raw hrefs, follow none. */
object HrefExportParser extends Parser {
  val id = "href_export"
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput = {
    if (!isHtml) return ParseOutput(Nil, Nil)
    val hrefs = Css.doc(html).find("a").nodes
      .map(a => rec(JStr(a.attr("href").getOrElse(""))))
    ParseOutput(hrefs, Nil)
  }
}

/** Body passthrough (geziyor_test.go:34-36: non-HTML flows deliver raw
  * body).
  */
object BodyParser extends Parser {
  val id = "body"
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput =
    ParseOutput(Seq(rec(JObj(Seq("url" -> JStr(url), "body" -> JStr(html))))), Nil)
}

/** Cookie-echo parser (test face of the cookie jar, geziyor_test.go:269-288:
  * the test server asserts the cookie arrived on the second request — here
  * the record carries the request's Cookie header from meta).
  */
object CookieEchoParser extends Parser {
  val id = "cookie_echo"
  def parse(url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): ParseOutput = {
    val records = Seq(rec(JObj(Seq(
      "cookie" -> JStr(meta.getOrElse("cookie", "")),
      "url" -> JStr(url)))))
    val links =
      if (!isHtml) Nil
      else Css.doc(html).find("a").nodes.flatMap(_.attr("href"))
        .map(href => Discovered(UrlOps.resolveLink(url, href), id))
    ParseOutput(records, links)
  }
}

object Parsers {
  val registry: Map[String, Parser] =
    Seq(QuotesParser, AllLinksParser, HrefExportParser, BodyParser,
      CookieEchoParser)
      .map(p => p.id -> p).toMap

  /** Panic recovery (geziyor.go:305-310): a throwing user parser never fails
    * the wave — it becomes a parse_error audit row.
    */
  def safeParse(registry: Map[String, Parser])(
      parserId: String, url: String, html: String, isHtml: Boolean,
      meta: Map[String, String]): Either[String, ParseOutput] =
    registry.get(parserId) match {
      case None => Left(s"unknown parser: $parserId")
      case Some(p) =>
        try Right(p.parse(url, html, isHtml, meta))
        catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
}
