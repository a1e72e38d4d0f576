package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal deterministic HTML document model + tokenizer.
  *
  * The sandbox has no jsoup (SURVEY.md §7), so extraction runs on this pure
  * Scala engine. Semantics target goquery/x-net-html behavior for the
  * controlled fixture subset: tags with quoted/unquoted attributes, void
  * elements, comments, raw-text script/style, named+numeric entities.
  * `.Text()` = concatenation of descendant text nodes in document order with
  * entities decoded (reference extraction semantics, geziyor_test.go:76-94).
  *
  * Used row-at-a-time inside Spark UDFs — parse once per row, run all
  * selectors on the same tree (the Spark analog of the single lazily-built
  * HTMLDoc per response, middleware/parse_html.go:15-24).
  */
sealed trait Node { def textTo(sb: StringBuilder): Unit }

final case class TextNode(text: String) extends Node {
  def textTo(sb: StringBuilder): Unit = sb.append(text)
}

final case class Elem(
    tag: String,
    attrs: Map[String, String],
    children: ArrayBuffer[Node]
) extends Node {
  def textTo(sb: StringBuilder): Unit = children.foreach(_.textTo(sb))
  def text: String = { val sb = new StringBuilder; textTo(sb); sb.toString }
  def attr(name: String): Option[String] = attrs.get(name)
  def classes: Set[String] =
    attrs.get("class").map(_.split("\\s+").filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
}

object HtmlParser {
  private val VoidTags = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr")
  private val RawTextTags = Set("script", "style")

  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ", "copy" -> "©",
    "reg" -> "®", "hellip" -> "…", "mdash" -> "—",
    "ndash" -> "–", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "times" -> "×",
    "middot" -> "·", "eacute" -> "é", "uuml" -> "ü",
    "ouml" -> "ö", "ccedil" -> "ç", "deg" -> "°")

  /** Decode &name; &#NN; &#xHH; — unknown entities pass through verbatim
    * (x/net/html leaves unterminated/unknown sequences as-is).
    */
  def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val name = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (name.startsWith("#x") || name.startsWith("#X"))
              try Some(Character.toChars(Integer.parseInt(name.drop(2), 16)).mkString)
              catch { case _: Exception => None }
            else if (name.startsWith("#"))
              try Some(Character.toChars(Integer.parseInt(name.drop(1))).mkString)
              catch { case _: Exception => None }
            else NamedEntities.get(name)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append(c); i += 1
          }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Parse an HTML string into a synthetic root element. Lenient: unmatched
    * close tags pop to the nearest matching open tag or are ignored.
    */
  def parse(html: String): Elem = {
    val root = Elem("#root", Map.empty, ArrayBuffer.empty)
    var stack = List(root)
    var i = 0
    val n = html.length

    def top = stack.head

    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) {
        if (i < n) top.children += TextNode(decodeEntities(html.substring(i)))
        i = n
      } else {
        if (lt > i) top.children += TextNode(decodeEntities(html.substring(i, lt)))
        if (html.startsWith("<!--", lt)) {
          val end = html.indexOf("-->", lt + 4)
          i = if (end < 0) n else end + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val end = html.indexOf('>', lt)          // doctype / PI
          i = if (end < 0) n else end + 1
        } else if (lt + 1 < n && html.charAt(lt + 1) == '/') {
          val end = html.indexOf('>', lt)
          if (end < 0) { i = n }
          else {
            val tag = html.substring(lt + 2, end).trim.toLowerCase
            if (stack.exists(e => e.tag == tag))
              while (stack.head.tag != tag && stack.head.tag != "#root")
                stack = stack.tail
            if (stack.head.tag == tag) stack = stack.tail
            i = end + 1
          }
        } else {
          parseOpenTag(html, lt) match {
            case Some((elem, selfClose, end)) =>
              top.children += elem
              val tag = elem.tag
              if (RawTextTags.contains(tag) && !selfClose) {
                val close = html.toLowerCase.indexOf(s"</$tag", end)
                val stop = if (close < 0) n else close
                if (stop > end) elem.children += TextNode(html.substring(end, stop))
                val gt = html.indexOf('>', stop)
                i = if (gt < 0) n else gt + 1
              } else {
                if (!selfClose && !VoidTags.contains(tag)) stack = elem :: stack
                i = end
              }
            case None =>
              top.children += TextNode("<"); i = lt + 1
          }
        }
      }
    }
    root
  }

  /** Parse `<tag attr="v" ...>` starting at `lt`. Returns (elem, selfClosed,
    * index-after-'>').
    */
  private def parseOpenTag(html: String, lt: Int): Option[(Elem, Boolean, Int)] = {
    var i = lt + 1
    val n = html.length
    val tagStart = i
    while (i < n && (html.charAt(i).isLetterOrDigit || html.charAt(i) == '-')) i += 1
    if (i == tagStart) return None
    val tag = html.substring(tagStart, i).toLowerCase
    val attrs = Map.newBuilder[String, String]
    var selfClose = false
    var done = false
    while (!done && i < n) {
      while (i < n && html.charAt(i).isWhitespace) i += 1
      if (i >= n) done = true
      else html.charAt(i) match {
        case '>' => i += 1; done = true
        case '/' =>
          if (i + 1 < n && html.charAt(i + 1) == '>') { selfClose = true; i += 2; done = true }
          else i += 1
        case _ =>
          val ks = i
          while (i < n && !html.charAt(i).isWhitespace &&
            html.charAt(i) != '=' && html.charAt(i) != '>' && html.charAt(i) != '/') i += 1
          val key = html.substring(ks, i).toLowerCase
          while (i < n && html.charAt(i).isWhitespace) i += 1
          if (i < n && html.charAt(i) == '=') {
            i += 1
            while (i < n && html.charAt(i).isWhitespace) i += 1
            if (i < n && (html.charAt(i) == '"' || html.charAt(i) == '\'')) {
              val q = html.charAt(i); i += 1
              val vs = i
              while (i < n && html.charAt(i) != q) i += 1
              attrs += key -> decodeEntities(html.substring(vs, i))
              if (i < n) i += 1
            } else {
              val vs = i
              while (i < n && !html.charAt(i).isWhitespace && html.charAt(i) != '>') i += 1
              attrs += key -> decodeEntities(html.substring(vs, i))
            }
          } else if (key.nonEmpty) attrs += key -> ""
      }
    }
    Some((Elem(tag, attrs.result(), ArrayBuffer.empty), selfClose, i))
  }
}
