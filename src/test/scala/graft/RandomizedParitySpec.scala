package graft

import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.fixtures.SiteFixtures
import graft.fixtures.SiteFixtures.Page
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob

/** Randomized engine-vs-simulator parity: generate random web graphs
  * (multi-host link structure, 503s, redirect chains, missing targets,
  * robots rules) and random crawl specs, then require the distributed
  * DataFrame engine and the sequential reference simulator to agree on
  * records, seen set, crawl order, audit counters and wave count — the
  * fixture suites pin curated shapes; this pins the semantics everywhere
  * else. Seeded PRNG → fully deterministic.
  */
class RandomizedParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def genCorpus(seed: Int): Seq[Page] = {
    val rnd = new scala.util.Random(seed)
    val nHosts = 2 + rnd.nextInt(3)
    val perHost = 3 + rnd.nextInt(5)
    val urls = for (h <- 0 until nHosts; p <- 0 until perHost)
      yield s"http://site$h.example.com/p$p"
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val pages = urls.zipWithIndex.map { case (u, i) =>
      val roll = rnd.nextInt(10)
      if (roll == 0) // retryable 503
        Page(u, ts, Array.emptyByteArray, "", "en", 503, "text/html", null)
      else if (roll == 1) { // redirect to a random url (may chain / dangle)
        val to = urls(rnd.nextInt(urls.size))
        Page(u, ts, Array.emptyByteArray, "", "en", 301, "text/html", to)
      } else {
        val k = rnd.nextInt(4)
        val links = Seq.fill(k) {
          if (rnd.nextInt(5) == 0) s"/p${rnd.nextInt(perHost + 2)}" // relative, maybe missing
          else urls(rnd.nextInt(urls.size))
        }
        val html = links.map(l => s"""<a href="$l">x</a>""")
          .mkString("<html><body>", "\n", "</body></html>")
        Page(u, ts, html.getBytes(StandardCharsets.UTF_8), html, "en", 200,
          "text/html; charset=utf-8", null)
      }
    }
    val robots = (0 until nHosts).filter(_ => rnd.nextInt(3) == 0).map { h =>
      val body = s"User-agent: *\nDisallow: /p${rnd.nextInt(perHost)}\n"
      Page(s"http://site$h.example.com/robots.txt", ts,
        body.getBytes(StandardCharsets.UTF_8), body, "en", 200,
        "text/plain; charset=utf-8", null)
    }
    pages ++ robots
  }

  private def genSpec(seed: Int, nHosts: Int): CrawlSpec = {
    val rnd = new scala.util.Random(seed * 7919 + 13)
    CrawlSpec(
      startUrls = Seq(s"http://site0.example.com/p0",
        s"http://site${nHosts - 1}.example.com/p1"),
      allowedDomains =
        if (rnd.nextInt(3) == 0)
          (0 until math.max(1, nHosts - 1)).map(h => s"site$h.example.com")
        else Nil,
      maxDepth = 1 + rnd.nextInt(4),
      maxWaves = 12,
      retryTimes = rnd.nextInt(3),
      hostTokensPerWave =
        if (rnd.nextBoolean()) Int.MaxValue else 1 + rnd.nextInt(3),
      concurrentRequests =
        if (rnd.nextInt(3) == 0) 2 + rnd.nextInt(5) else Int.MaxValue,
      robotsTxtDisabled = rnd.nextBoolean(),
      urlRevisitEnabled = rnd.nextInt(6) == 0,
      parserId = "all_links",
      syncOrder = true)
  }

  private def check(seed: Int): Unit = {
    val corpus = genCorpus(seed)
    val nHosts = corpus.map(p => p.url.split('/')(2)).distinct
      .count(_.startsWith("site"))
    val spec = genSpec(seed, nHosts)
    val pagesMap = corpus.map(p => p.url -> p).toMap
    val df = SiteFixtures.pagesDf(spark, corpus)
    val sim = ReferenceSimulator.crawl(spec, pagesMap)
    val res = CrawlJob.run(spark, spec, df)

    val recs = res.records.orderBy(col("wave"), col("rank"), col("seq"))
      .select("json").collect().map(_.getString(0)).toSeq
    assert(recs == sim.records, s"records seed=$seed spec=$spec")
    val seen = res.seen.collect().map(_.getString(0)).toSet
    assert(seen == sim.seen, s"seen seed=$seed")
    val ord = res.crawlOrder.orderBy(col("wave"), col("rank"))
      .collect().map(r => (r.getInt(0), r.getString(2))).toSeq
    assert(ord == sim.order, s"order seed=$seed")
    val kinds = res.audit.groupBy("kind").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toInt).toMap
    assert(kinds == sim.auditKinds, s"audit seed=$seed")
    assert(res.waves == sim.waves, s"waves seed=$seed")

    // scale mode on the same (corpus, spec): identical results modulo order
    val scale = CrawlJob.run(spark, spec.copy(syncOrder = false), df)
    assert(scale.records.select("json").collect().map(_.getString(0)).sorted
      .toSeq == recs.sorted, s"scale records seed=$seed")
    assert(scale.seen.collect().map(_.getString(0)).toSet == seen,
      s"scale seen seed=$seed")
  }

  (1 to 4).foreach { seed =>
    test(s"random graph + random spec parity (seed $seed)") { check(seed) }
  }
}
