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

  test("bloomDedup crawl is result-identical to exact-only crawl " +
      "and never rebuilds the sketch per wave") {
    val pages = SiteFixtures.pagesDf(spark).cache()
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)
    val exact = CrawlJob.run(spark, spec, pages)
    SeenSet.fullBuilds.set(0)
    val bloom = CrawlJob.run(spark, spec.copy(bloomDedup = true), pages)
    // incremental maintenance: bootstrap + at most a couple of geometric
    // regrowths — NOT one full-seen rebuild per wave (the round-3
    // scale-killer; this crawl runs ~12 populated waves)
    assert(SeenSet.fullBuilds.get() <= 3,
      s"bloom rebuilt ${SeenSet.fullBuilds.get()} times over ${bloom.waves} waves")
    def recs(r: CrawlJob.CrawlResult) =
      r.records.orderBy(col("wave"), col("rank"), col("seq"))
        .select("json").collect().map(_.getString(0)).toSeq
    assert(recs(bloom) == recs(exact))
    assert(bloom.seen.collect().map(_.getString(0)).toSet ==
      exact.seen.collect().map(_.getString(0)).toSet)
  }

  test("cuckooDedup crawl is result-identical to exact-only crawl " +
      "and never rebuilds the shard table per wave") {
    val pages = SiteFixtures.pagesDf(spark).cache()
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)
    val exact = CrawlJob.run(spark, spec, pages)
    SeenSet.fullBuilds.set(0)
    val cuckoo = CrawlJob.run(spark, spec.copy(cuckooDedup = true), pages)
    assert(SeenSet.fullBuilds.get() <= 3,
      s"cuckoo rebuilt ${SeenSet.fullBuilds.get()} times over ${cuckoo.waves} waves")
    def recs(r: CrawlJob.CrawlResult) =
      r.records.orderBy(col("wave"), col("rank"), col("seq"))
        .select("json").collect().map(_.getString(0)).toSeq
    assert(recs(cuckoo) == recs(exact))
    assert(cuckoo.seen.collect().map(_.getString(0)).toSet ==
      exact.seen.collect().map(_.getString(0)).toSet)
  }

  test("mergeIncrement equals full rebuild membership (associative bit-or)") {
    val base = (0 until 10000).map(i => s"http://h.example.com/a/$i").toDF("url")
    val inc = (0 until 5000).map(i => s"http://h.example.com/b/$i").toDF("url")
    val st0 = SeenSet.buildState(base, 10000)
    val st1 = SeenSet.mergeIncrement(st0, inc, 5000)
    assert(st1.count == 15000)
    // no false negatives across BOTH halves after the in-place merge
    (0 until 10000).foreach(i =>
      assert(st1.bloom.mightContain(s"http://h.example.com/a/$i")))
    (0 until 5000).foreach(i =>
      assert(st1.bloom.mightContain(s"http://h.example.com/b/$i")))
  }
}
