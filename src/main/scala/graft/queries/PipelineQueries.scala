package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob

/** End-to-end crawl queries over the deterministic fixture corpus — the
  * full wave pipeline (politeness → robots → fetch ⋈ → retry/redirect →
  * decode/extract → frontier expansion).
  *
  * The fixture corpus is a pure function of page coordinates
  * (SiteFixtures), so the expected outputs ARE closed-form: the DuckDB
  * oracles below recompute the exact expected rows from first principles
  * (generate_series over quote indices / constant audit counts), pinning the
  * whole engine pipeline — parse, selector extraction, JSON serialization,
  * crawl order — against an independent derivation. These run in the
  * reference-parity crawl mode (syncOrder=true: exact global discovery
  * ranks, geziyor.go:225-227).
  */
object PipelineQueries {

  private def pages(s: SparkSession) = SiteFixtures.pagesDf(s)

  /** Flagship: quotes.toscrape 10-page pagination crawl → 100 extracted
    * records in deterministic crawl order (geziyor_test.go:67-94 analog).
    *
    * Expected-output derivation (mirrored by the oracle):
    *  - page p (1-based) is fetched at wave p-1 (pagination chain, BFS);
    *  - the seed carries rank 0 (startUrls index); every later wave's single
    *    discovered url gets sync-order rank 1 (row_number over one row);
    *  - quote i on page p is record seq=i with global index g=(p-1)*10+i;
    *  - json = Go-map-marshal compact encoding: keys sorted
    *    (author, number, tags, text), no HTML escaping.
    */
  val qCrawlQuotes = Q(
    "q17_crawl_quotes_e2e",
    (s, _) => {
      val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
        parserId = "quotes", syncOrder = true, maxWaves = 20)
      CrawlJob.run(s, spec, pages(s)).records
        .orderBy(col("wave"), col("rank"), col("seq"))
    },
    Some {
      val authors = SiteFixtures.authors.map(a => s"'$a'").mkString(", ")
      val tags = SiteFixtures.tagNames.map(t => s"'$t'").mkString(", ")
      // NB: the em-dash / curly quotes below are the authored fixture text
      // (SiteFixtures.quoteText), round-tripped through HTML-entity encode →
      // parse → extract; byte-identity is the BASELINE.json per-row invariant.
      s"""WITH g AS (SELECT CAST(unnest(range(0, 100)) AS BIGINT) AS gnum)
         |SELECT
         |  CAST(gnum // 10 AS INT) AS wave,
         |  CAST(CASE WHEN gnum < 10 THEN 0 ELSE 1 END AS BIGINT) AS rank,
         |  CAST(gnum % 10 AS INT) AS seq,
         |  '{"author":"' || ([$authors])[CAST(gnum % 7 AS INT) + 1] ||
         |  '","number":' || CAST(gnum % 10 AS VARCHAR) ||
         |  ',"tags":["' ||
         |    array_to_string(list_transform(range(0, CAST(gnum % 3 AS INT) + 1),
         |      j -> ([$tags])[CAST((gnum + j) % 7 AS INT) + 1]), '","') ||
         |  '"],"text":"“Deterministic wisdom #' || CAST(gnum AS VARCHAR) ||
         |  ' — simplicity & scale.”"}' AS json
         |FROM g""".stripMargin
    })

  /** Books whole-site BFS with AllowedDomains + audit counters
    * (geziyor_test.go:96-116 analog).
    *
    * Expected-count derivation (mirrored by the oracle): the books site is
    * 1 index + 5 categories + 5×6 books = 36 pages, each crawled exactly
    * once (dup/fragment links dedup away); the one cross-host link on the
    * index page is rejected by AllowedDomains; the robots middleware
    * fetches robots.txt for the ONE newly-seen host (metrics.go:31 counts
    * the request even though the books fixture serves no robots page, so
    * no response row) → kinds = {crawled: 36, rejected_domain: 1,
    * robots_request: 1}.
    */
  val qCrawlBooksAudit = Q(
    "q18_crawl_books_audit",
    (s, _) => {
      val spec = CrawlSpec(startUrls = Seq(SiteFixtures.BooksBase),
        allowedDomains = Seq("books.toscrape.com"),
        parserId = "all_links", syncOrder = true, maxWaves = 20)
      CrawlJob.run(s, spec, pages(s)).audit
        .groupBy(col("kind")).agg(count(lit(1)).as("n"))
    },
    Some("""SELECT * FROM (VALUES
        |  ('crawled', CAST(36 AS BIGINT)),
        |  ('rejected_domain', CAST(1 AS BIGINT)),
        |  ('robots_request', CAST(1 AS BIGINT))) AS t(kind, n)""".stripMargin))

  val all: Seq[Q] = Seq(qCrawlQuotes, qCrawlBooksAudit)
}
