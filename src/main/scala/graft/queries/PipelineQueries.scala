package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob

/** End-to-end crawl queries over the deterministic fixture corpus — the
  * full wave pipeline (politeness → robots → fetch ⋈ → retry/redirect →
  * decode/extract → frontier expansion). Not ANSI-SQL-expressible (iterative
  * + UDF extraction) → rows-only driver check; exactness is enforced by
  * CrawlJobSpec's simulator parity instead.
  */
object PipelineQueries {

  private def pages(s: SparkSession) = SiteFixtures.pagesDf(s)

  /** Flagship: quotes.toscrape 10-page pagination crawl → 100 extracted
    * records in deterministic crawl order (geziyor_test.go:67-94 analog).
    */
  val qCrawlQuotes = Q(
    "q17_crawl_quotes_e2e",
    (s, _) => {
      val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
        parserId = "quotes", maxWaves = 20)
      CrawlJob.run(s, spec, pages(s)).records
        .orderBy(col("wave"), col("rank"), col("seq"))
    },
    None)

  /** Books whole-site BFS with AllowedDomains + audit counters. */
  val qCrawlBooksAudit = Q(
    "q18_crawl_books_audit",
    (s, _) => {
      val spec = CrawlSpec(startUrls = Seq(SiteFixtures.BooksBase),
        allowedDomains = Seq("books.toscrape.com"),
        parserId = "all_links", maxWaves = 20)
      CrawlJob.run(s, spec, pages(s)).audit
        .groupBy(col("kind")).agg(count(lit(1)).as("n"))
    },
    None)

  val all: Seq[Q] = Seq(qCrawlQuotes, qCrawlBooksAudit)
}
