package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.SiteFixtures
import graft.metrics.Exposition
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob

/** Metrics exposition goldens (metrics/metrics.go:37-60 Prometheus/ExpVar
  * analog) over a deterministic crawl's counter table.
  */
class ExpositionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val metrics = {
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxDepth = 2, syncOrder = true, maxWaves = 20)
    CrawlJob.run(spark, spec, SiteFixtures.pagesDf(spark)).metrics
  }

  test("prometheus text exposition: sorted counter families with wave labels") {
    val text = Exposition.prometheus(metrics)
    val expected =
      """# TYPE geziyorspark_crawled_total counter
        |geziyorspark_crawled_total{wave="0"} 1
        |geziyorspark_crawled_total{wave="1"} 1
        |geziyorspark_crawled_total{wave="2"} 1
        |geziyorspark_crawled_total{wave="all"} 3
        |# TYPE geziyorspark_frontier_size_total counter
        |geziyorspark_frontier_size_total{wave="0"} 1
        |geziyorspark_frontier_size_total{wave="1"} 1
        |geziyorspark_frontier_size_total{wave="2"} 1
        |geziyorspark_frontier_size_total{wave="all"} 3
        |# TYPE geziyorspark_robots_request_total counter
        |geziyorspark_robots_request_total{wave="0"} 1
        |geziyorspark_robots_request_total{wave="all"} 1
        |# TYPE geziyorspark_robots_response_total counter
        |geziyorspark_robots_response_total{wave="0"} 1
        |geziyorspark_robots_response_total{wave="all"} 1
        |""".stripMargin
    assert(text == expected)
  }

  test("expvar JSON: Go map-marshal conventions (sorted keys, compact)") {
    assert(Exposition.expvarJson(metrics) ==
      """{"crawled":3,"frontier_size":3,"robots_request":1,"robots_response":1}""")
  }
}
