package graft.pipeline

/** Corpus-mode model of the reference's Chrome rendering action pipeline
  * (client/client.go:171-247 `doRequestChrome`).
  *
  * The reference drives a headless browser with an ordered action list:
  * the DEFAULT list (client/client.go:189-212) is
  * network-enable → set-headers → document-response listener → Navigate →
  * WaitReady(":root") → GetOuterHTML-into-body. Two extension points with
  * very different semantics:
  *
  *  - `Options.PreActions` (options.go:80) REPLACES the default list
  *    entirely (client/client.go:215-217) — the caller then owns
  *    navigation, waiting AND capture; a replacement list that never
  *    captures leaves `body` empty and the document response `res` nil, so
  *    the delivered Response has an empty body and StatusCode 0
  *    (client/client.go:227-246).
  *  - `Request.Actions` (client/request.go:32) are APPENDED AFTER the
  *    (possibly replaced) list (client/client.go:219-221) — i.e. after the
  *    default list's OuterHTML capture, so their DOM mutations are
  *    invisible in the captured body unless the caller also replaced
  *    PreActions with a list that captures later.
  *
  * Corpus-mode analog: the "browser DOM" is the page's pre-rendered `text`
  * variant; custom DOM-mutating actions (infinite scroll, click-to-reveal)
  * append deterministic content blocks derived purely from the url — so an
  * ANSI-SQL oracle can reconstruct every outcome arithmetically (the
  * q46/q47/q48 self-proving pattern). The interpreter is a pure per-row
  * function: at scale it runs inside the fetch projection with zero extra
  * shuffle.
  */
object Actions {

  sealed trait Action extends Serializable

  /** chromedp.Navigate + the document-response listener it feeds
    * (client/client.go:192-205): loads the rendered DOM and marks the
    * document response as received (status becomes observable).
    */
  case object Navigate extends Action

  /** chromedp.WaitReady(":root") (client/client.go:207) — readiness gate;
    * no corpus-observable effect.
    */
  case object WaitReady extends Action

  /** dom.GetOuterHTML → body (client/client.go:208-212): snapshots the
    * CURRENT DOM into the response body. Position matters: mutations after
    * this action are not captured.
    */
  case object CaptureOuterHTML extends Action

  /** chromedp.Sleep analog — settle delay; no corpus-observable effect. */
  final case class Sleep(ms: Long) extends Action

  /** Infinite-scroll analog (the canonical custom chromedp action): each
    * scroll reveals one deterministic lazy-loaded block with a next-page
    * link derived from the url.
    */
  final case class ScrollToBottom(times: Int) extends Action

  /** Click-to-reveal analog: clicking `selector` appends the revealed
    * block once (idempotent, like a real disclosure widget).
    */
  final case class Click(selector: String) extends Action

  /** The default action list (client/client.go:189-212). */
  val defaults: Seq[Action] = Seq(Navigate, WaitReady, CaptureOuterHTML)

  /** What one scroll reveals (pure function of url and scroll ordinal —
    * SQL-reconstructable).
    */
  def lazyBlock(url: String, k: Int): String =
    s"""<div class="lazy"><a href="$url?scroll=$k">more</a></div>"""

  /** What a click on `#more` reveals (pure function of url). */
  def clickBlock(url: String): String =
    s"""<div id="revealed"><a href="$url?clicked=1">detail</a></div>"""

  /** Rendering outcome: `body` is what GetOuterHTML captured ("" if the
    * program never captured); `statusSet` mirrors the reference's `res !=
    * nil` (document listener fired ⇔ our Navigate ran) — false delivers
    * StatusCode 0 (client/client.go:232-239).
    */
  final case class Rendered(body: String, statusSet: Boolean)

  /** The effective program for a crawl: replaced-or-default PreActions,
    * then per-request actions appended (client/client.go:215-221).
    */
  def program(preActions: Option[Seq[Action]],
      requestActions: Seq[Action]): Seq[Action] =
    preActions.getOrElse(defaults) ++ requestActions

  /** Pure interpreter. The DOM starts empty; Navigate loads `text`;
    * ScrollToBottom/Click append their deterministic blocks (mutations on
    * a not-yet-navigated empty DOM are dropped, like a browser with no
    * document); CaptureOuterHTML snapshots the DOM at its position.
    */
  def render(url: String, text: String, prog: Seq[Action]): Rendered = {
    var dom = ""
    var navigated = false
    var scrolls = 0
    var clicked = false
    var body: String = null
    prog.foreach {
      case Navigate =>
        dom = if (text == null) "" else text
        navigated = true
      case WaitReady | Sleep(_) => ()
      case ScrollToBottom(times) =>
        if (navigated) {
          var i = 0
          while (i < times) {
            scrolls += 1
            dom += lazyBlock(url, scrolls)
            i += 1
          }
        }
      case Click(selector) =>
        if (navigated && selector == "#more" && !clicked) {
          dom += clickBlock(url)
          clicked = true
        }
      case CaptureOuterHTML =>
        body = dom
    }
    Rendered(if (body == null) "" else body, statusSet = navigated)
  }
}
