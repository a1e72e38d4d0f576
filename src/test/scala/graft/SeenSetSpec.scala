package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob
import graft.state.SeenSet

class SeenSetSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("Bloom layer has no false negatives: every seen url is maybe-seen") {
    val seen = (0 until 50000).map(i => s"http://h${i % 97}.example.com/p/$i")
      .toDF("url")
    val layered = SeenSet.build(seen, 50000)
    // every member must be contained — a false negative would re-fetch
    val misses = seen.collect().map(_.getString(0))
      .count(u => !layered.bloom.mightContain(u))
    assert(misses == 0)
  }

  test("filterNew is exactly the anti-join (FPs confirmed away)") {
    val seen = (0 until 20000 by 2)
      .map(i => s"http://h.example.com/p/$i").toDF("url")
    val cand = (0 until 20000)
      .map(i => s"http://h.example.com/p/$i").toDF("url")
    val layered = SeenSet.build(seen, 10000, fpp = 0.2) // high fpp on purpose
    val got = SeenSet.filterNew(cand, layered)
      .collect().map(_.getString(0)).toSet
    val want = cand.join(seen, Seq("url"), "left_anti")
      .collect().map(_.getString(0)).toSet
    assert(got == want)
    assert(want.size == 10000)
  }

  test("bloomDedup crawl is result-identical to exact-only crawl") {
    val pages = SiteFixtures.pagesDf(spark).cache()
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)
    val exact = CrawlJob.run(spark, spec, pages)
    val bloom = CrawlJob.run(spark, spec.copy(bloomDedup = true), pages)
    def recs(r: CrawlJob.CrawlResult) =
      r.records.orderBy(col("wave"), col("rank"), col("seq"))
        .select("json").collect().map(_.getString(0)).toSeq
    assert(recs(bloom) == recs(exact))
    assert(bloom.seen.collect().map(_.getString(0)).toSet ==
      exact.seen.collect().map(_.getString(0)).toSet)
  }

  test("cuckooDedup crawl is result-identical to exact-only crawl") {
    val pages = SiteFixtures.pagesDf(spark).cache()
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)
    val exact = CrawlJob.run(spark, spec, pages)
    val cuckoo = CrawlJob.run(spark, spec.copy(cuckooDedup = true), pages)
    def recs(r: CrawlJob.CrawlResult) =
      r.records.orderBy(col("wave"), col("rank"), col("seq"))
        .select("json").collect().map(_.getString(0)).toSeq
    assert(recs(cuckoo) == recs(exact))
    assert(cuckoo.seen.collect().map(_.getString(0)).toSet ==
      exact.seen.collect().map(_.getString(0)).toSet)
  }
}
