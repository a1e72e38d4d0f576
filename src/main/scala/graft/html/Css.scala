package graft.html

/** CSS selector subset + goquery-style Selection.
  *
  * Grammar: compound selectors `tag`, `.class`, `#id`, `[attr]`,
  * `[attr=value]` and their concatenations (`div.quote`, `a.tag`), combined
  * with descendant (whitespace) and child (`>`) combinators — exactly the
  * shapes the reference's test parsers use (geziyor_test.go:76-94:
  * `div.quote`, `span.text`, `small.author`, `div.tags > a.tag`,
  * `li.next > a`, `a`).
  *
  * Find semantics match goquery: matches are searched among *descendants* of
  * each selection node (not the nodes themselves), results are unique and in
  * document order.
  */
object Css {

  final case class Compound(
      tag: Option[String],
      classes: Set[String],
      id: Option[String],
      attrs: Seq[(String, Option[String])]) {
    def matches(e: Elem): Boolean =
      tag.forall(_ == e.tag) &&
        classes.subsetOf(e.classes) &&
        id.forall(i => e.attrs.get("id").contains(i)) &&
        attrs.forall { case (k, v) =>
          e.attrs.contains(k) && v.forall(e.attrs(k) == _)
        }
  }

  /** (combinatorToPrev, compound): head is always descendant-combined. */
  final case class Selector(parts: Seq[(Char, Compound)])

  def parseSelector(s: String): Selector = {
    val toks = s.trim
      .replace(">", " > ")
      .split("\\s+").filter(_.nonEmpty)
    val parts = Seq.newBuilder[(Char, Compound)]
    var comb = ' '
    toks.foreach {
      case ">" => comb = '>'
      case t => parts += ((comb, parseCompound(t))); comb = ' '
    }
    Selector(parts.result())
  }

  private def parseCompound(s: String): Compound = {
    var tag: Option[String] = None
    var classes = Set.empty[String]
    var id: Option[String] = None
    var attrs = Seq.empty[(String, Option[String])]
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '.' =>
          val j = nextSep(s, i + 1); classes += s.substring(i + 1, j); i = j
        case '#' =>
          val j = nextSep(s, i + 1); id = Some(s.substring(i + 1, j)); i = j
        case '[' =>
          val j = s.indexOf(']', i)
          val body = s.substring(i + 1, if (j < 0) s.length else j)
          val eq = body.indexOf('=')
          if (eq < 0) attrs :+= (body -> None)
          else attrs :+= (body.substring(0, eq) ->
            Some(body.substring(eq + 1).stripPrefix("\"").stripSuffix("\"")
              .stripPrefix("'").stripSuffix("'")))
          i = if (j < 0) s.length else j + 1
        case '*' => i = nextSep(s, i + 1)
        case _ =>
          val j = nextSep(s, i); tag = Some(s.substring(i, j).toLowerCase); i = j
      }
    }
    Compound(tag, classes, id, attrs)
  }

  private def nextSep(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && s.charAt(i) != '.' && s.charAt(i) != '#' &&
      s.charAt(i) != '[') i += 1
    i
  }

  /** goquery-style selection over the tree. */
  final case class Selection(nodes: Seq[Elem]) {

    def find(selector: String): Selection = {
      val sel = parseSelector(selector)
      val seen = new java.util.IdentityHashMap[Elem, Unit]()
      val out = Seq.newBuilder[Elem]
      nodes.foreach { root =>
        matchFrom(root, sel.parts.toList).foreach { e =>
          if (!seen.containsKey(e)) { seen.put(e, ()); out += e }
        }
      }
      Selection(out.result())
    }

    /** Matches in document order among strict descendants of `root`. */
    private def matchFrom(root: Elem, parts: List[(Char, Compound)]): Seq[Elem] =
      parts match {
        case Nil => Seq.empty
        case (_, c) :: rest =>
          // first part: any descendant of root
          val firstMatches = descendants(root).filter(c.matches)
          rest.foldLeft(firstMatches) { (cur, part) =>
            val (comb, cc) = part
            val seen = new java.util.IdentityHashMap[Elem, Unit]()
            val out = Seq.newBuilder[Elem]
            val cands: Seq[Elem] = cur.flatMap { e =>
              if (comb == '>') e.children.collect { case el: Elem => el }
              else descendants(e)
            }
            cands.foreach { e =>
              if (cc.matches(e) && !seen.containsKey(e)) { seen.put(e, ()); out += e }
            }
            // restore document order across branches
            docOrder(root, out.result())
          }
      }

    private def descendants(e: Elem): Seq[Elem] = {
      val out = Seq.newBuilder[Elem]
      def rec(x: Elem): Unit = x.children.foreach {
        case el: Elem => out += el; rec(el)
        case _ =>
      }
      rec(e)
      out.result()
    }

    private def docOrder(root: Elem, es: Seq[Elem]): Seq[Elem] = {
      if (es.length <= 1) return es
      val want = new java.util.IdentityHashMap[Elem, Unit]()
      es.foreach(e => want.put(e, ()))
      val out = Seq.newBuilder[Elem]
      def rec(x: Elem): Unit = x.children.foreach {
        case el: Elem =>
          if (want.containsKey(el)) out += el
          rec(el)
        case _ =>
      }
      rec(root)
      out.result()
    }

    /** Concatenated text of all nodes (goquery .Text()). */
    def text: String = {
      val sb = new StringBuilder
      nodes.foreach(_.textTo(sb))
      sb.toString
    }

    /** First node's attribute (goquery .Attr()). */
    def attr(name: String): Option[String] =
      nodes.headOption.flatMap(_.attr(name))

    def each[T](f: (Int, Selection) => T): Seq[T] =
      nodes.zipWithIndex.map { case (e, i) => f(i, Selection(Seq(e))) }

    def map[T](f: Selection => T): Seq[T] = nodes.map(e => f(Selection(Seq(e))))

    def size: Int = nodes.length
    def isEmpty: Boolean = nodes.isEmpty
  }

  def doc(html: String): Selection = Selection(Seq(HtmlParser.parse(html)))
}
