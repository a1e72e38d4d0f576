package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.{Actions, CrawlJob}
import graft.pipeline.Actions._

/** Chrome rendering action programs (pipeline/Actions.scala — the corpus
  * chromedp analog of client/client.go:171-247): pure interpreter semantics
  * plus the engine wiring (CrawlSpec.preActions / requestActions).
  */
class ActionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val pagesDf = SiteFixtures.pagesDf(spark).cache()

  private val U = "http://x.example.com/p"
  private val T = "<html><body><p>dom</p></body></html>"

  // ---- pure interpreter ---------------------------------------------------

  test("default list captures the navigated DOM (body = text, status set)") {
    val r = Actions.render(U, T, Actions.defaults)
    assert(r.body == T)
    assert(r.statusSet)
  }

  test("appended Request.Actions run AFTER the default capture — their DOM " +
      "effects are invisible in the body (client/client.go:219-221)") {
    val prog = Actions.defaults ++ Seq(ScrollToBottom(3), Click("#more"))
    val r = Actions.render(U, T, prog)
    assert(r.body == T) // capture happened before the mutations
    assert(r.statusSet)
  }

  test("replacing PreActions that capture after mutations see them, with " +
      "deterministic scroll ordinals across multiple scroll actions") {
    val prog = Seq(Navigate, ScrollToBottom(1), Sleep(5), ScrollToBottom(1),
      Click("#more"), CaptureOuterHTML)
    val r = Actions.render(U, T, prog)
    assert(r.body ==
      T + Actions.lazyBlock(U, 1) + Actions.lazyBlock(U, 2) +
        Actions.clickBlock(U))
    assert(r.statusSet)
  }

  test("click is idempotent; clicks on unknown selectors are no-ops") {
    val prog = Seq(Navigate, Click("#more"), Click("#more"), Click("#nope"),
      CaptureOuterHTML)
    val r = Actions.render(U, T, prog)
    assert(r.body == T + Actions.clickBlock(U))
  }

  test("capture-less replacement delivers an EMPTY body (client.go res " +
      "captured nothing) but a navigated document response") {
    val r = Actions.render(U, T, Seq(Navigate, Sleep(1), ScrollToBottom(2)))
    assert(r.body == "")
    assert(r.statusSet)
  }

  test("navigate-less replacement: mutations on the empty pre-document DOM " +
      "are dropped; document response unset (StatusCode 0 branch)") {
    val r = Actions.render(U, T, Seq(ScrollToBottom(2), CaptureOuterHTML))
    assert(r.body == "")
    assert(!r.statusSet)
  }

  test("null text navigates to an empty DOM") {
    val r = Actions.render(U, null, Actions.defaults)
    assert(r.body == "")
    assert(r.statusSet)
  }

  // ---- engine wiring ------------------------------------------------------

  private def auditKinds(r: CrawlJob.CrawlResult): Map[String, Long] =
    r.audit.groupBy("kind").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

  test("override PreActions with scroll+capture: the lazy-load link joins " +
      "the frontier (discovered url carries ?scroll=1)") {
    val spec = CrawlSpec(startUrls = Seq("http://js.example.com/app"),
      parserId = "all_links", rendered = true, maxWaves = 3,
      preActions = Some(Seq(Navigate, ScrollToBottom(1), CaptureOuterHTML)))
    val res = CrawlJob.run(spark, spec, pagesDf)
    val urls = res.audit.select("kind", "url").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // the SPA's hydrated /detail link still crawls; the scroll-revealed
    // link is new to the corpus → fetch error path
    assert(urls.exists { case (k, u) => k == "crawled" && u.endsWith("/detail") })
    assert(urls.exists { case (k, u) =>
      u.contains("?scroll=1") && k != "crawled" })
  }

  test("appended requestActions after the default capture change nothing " +
      "observable (scroll link never discovered)") {
    val spec = CrawlSpec(startUrls = Seq("http://js.example.com/app"),
      parserId = "all_links", rendered = true, maxWaves = 3,
      requestActions = Seq(ScrollToBottom(1)))
    val res = CrawlJob.run(spark, spec, pagesDf)
    assert(auditKinds(res)("crawled") == 2) // app + detail, like plain rendered
    assert(res.audit.filter(col("url").contains("?scroll=")).count() == 0)
  }

  test("capture-less override: crawled with real status but empty body " +
      "(no links, body parser sees nothing)") {
    val spec = CrawlSpec(startUrls = Seq("http://js.example.com/app"),
      parserId = "body", rendered = true, maxWaves = 3,
      preActions = Some(Seq(Navigate, Sleep(1))))
    val res = CrawlJob.run(spark, spec, pagesDf)
    val crawled = res.audit.filter(col("kind") === "crawled")
      .select("status").collect()
    assert(crawled.length == 1 && crawled.head.getInt(0) == 200)
    val recs = res.records.select("json").collect().map(_.getString(0))
    assert(recs.length == 1 && !recs.head.contains("hydrated"))
  }

  test("navigate-less override: StatusCode 0 on the crawled row " +
      "(client/client.go:227-239 res==nil)") {
    val spec = CrawlSpec(startUrls = Seq("http://js.example.com/app"),
      parserId = "all_links", rendered = true, maxWaves = 2,
      preActions = Some(Seq(CaptureOuterHTML)))
    val res = CrawlJob.run(spark, spec, pagesDf)
    val crawled = res.audit.filter(col("kind") === "crawled")
      .select("status").collect()
    assert(crawled.length == 1 && crawled.head.getInt(0) == 0)
  }
}
