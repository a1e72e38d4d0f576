package graft.html

/** Main-content extraction (boilerplate removal) — the text-quality step a
  * webtext pipeline runs between HTML parse and language-ID/dedup:
  * navigation bars, footers, and link lists must not pollute the training
  * text. Blocks are classified by LINK DENSITY (anchor-text chars over
  * total text chars), the core signal of the boilerpipe/jusText family
  * (Kohlschütter et al., "Boilerplate Detection using Shallow Text
  * Features", WSDM 2010) — no site-specific selectors, so it works on
  * arbitrary pages, unlike the q39 selector extraction that needs to know
  * the page's structure up front.
  *
  * Scale: pure per-row map over the html column (parse once per document,
  * no shuffle, no driver state) — the same distribution shape as the parse
  * stage of the crawl pipeline; at 100 TB it runs wherever the decode/parse
  * stage already runs and adds zero data movement.
  */
object Boilerplate {

  /** One top-level block: its concatenated text, how many of those chars
    * sit inside `<a>` descendants, and the resulting link density.
    */
  final case class Block(tag: String, text: String, anchorChars: Int) {
    def totalChars: Int = text.length
    def linkDensity: Double =
      if (totalChars == 0) 1.0 else anchorChars.toDouble / totalChars
  }

  /** Tags whose text is never document content (raw code / metadata). */
  private val NonContentTags =
    Set("script", "style", "template", "noscript")

  private def anchorChars(n: Node, inAnchor: Boolean): Int = n match {
    case TextNode(t) => if (inAnchor) t.length else 0
    case e: Elem =>
      val ia = inAnchor || e.tag == "a"
      var sum = 0
      e.children.foreach(c => sum += anchorChars(c, ia))
      sum
  }

  private def findBody(e: Elem): Option[Elem] =
    if (e.tag == "body") Some(e)
    else e.children.iterator.collect { case c: Elem => findBody(c) }
      .collectFirst { case Some(b) => b }

  /** The element children of `<body>` (or of the document root when no body
    * exists), in document order, with script/style/template/noscript
    * excluded entirely.
    */
  def blocks(html: String): Seq[Block] = {
    val root = HtmlParser.parse(html)
    val container = findBody(root).getOrElse(root)
    container.children.toSeq.collect {
      case e: Elem if !NonContentTags.contains(e.tag) =>
        Block(e.tag, e.text, anchorChars(e, e.tag == "a"))
    }
  }

  /** Main content: text of the blocks whose link density is at or below
    * `maxLinkDensity` (and that contain any non-whitespace text), joined in
    * document order with '\n'.
    */
  def mainContent(html: String, maxLinkDensity: Double = 0.5): String =
    blocks(html)
      .filter(b => b.text.trim.nonEmpty && b.linkDensity <= maxLinkDensity)
      .map(_.text)
      .mkString("\n")
}
