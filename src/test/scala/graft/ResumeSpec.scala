package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.Files
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.CrawlJob
import graft.state.StateStore

/** Exact resume from checkpoint: no re-fetches, no lost frontier entries
  * (BASELINE.json north_star; Dummy-cache semantics cache/cache.go:136-173).
  */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private lazy val pagesDf = SiteFixtures.pagesDf(spark).cache()

  test("kill after wave 2, resume, end state identical to an uninterrupted run") {
    val dir = Files.createTempDirectory("graft-state").toString
    val full = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)

    // uninterrupted reference run
    val direct = CrawlJob.run(spark, full, pagesDf)
    val directRecs = direct.records.orderBy(col("wave"), col("rank"), col("seq"))
      .select("json").collect().map(_.getString(0)).toSeq

    // "crash" after 3 waves
    val partial = CrawlJob.run(spark, full.copy(maxWaves = 3), pagesDf,
      stateDir = Some(dir))
    assert(StateStore.latestCommitted(dir).contains(2))
    val partialOrder = partial.crawlOrder.count()

    // resume from the committed snapshot
    val resumed = CrawlJob.run(spark, full, pagesDf, stateDir = Some(dir))
    val resumedRecs = resumed.records.orderBy(col("wave"), col("rank"), col("seq"))
      .select("json").collect().map(_.getString(0)).toSeq

    assert(resumedRecs == directRecs)
    assert(resumed.seen.collect().map(_.getString(0)).toSet ==
      direct.seen.collect().map(_.getString(0)).toSet)
    assert(resumed.waves == direct.waves)

    // no re-fetches: every url issued exactly once overall (quotes chain has
    // no retries), and the resumed order strictly extends the partial order
    val order = resumed.crawlOrder.collect().map(r => (r.getInt(0), r.getString(2)))
    assert(order.length == order.distinct.length)
    assert(order.map(_._2).length == order.map(_._2).distinct.length)
    assert(resumed.crawlOrder.filter(col("wave") < 3).count() == partialOrder)
  }

  test("delta commits: wave N writes ONLY wave-N increments for accumulators") {
    val dir = Files.createTempDirectory("graft-state-delta").toString
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 3)
    val res = CrawlJob.run(spark, spec, pagesDf, stateDir = Some(dir))

    // each accumulator increment dir holds exactly its own wave's rows —
    // commit volume is O(wave output), not O(crawl history)
    for (w <- 0 until 3; table <- Seq("audit", "crawl_order", "records")) {
      val delta = spark.read.parquet(s"$dir/delta/$table/wave=$w")
      assert(delta.filter(col("wave") =!= w).count() == 0,
        s"$table wave=$w delta contains foreign-wave rows")
      assert(delta.count() ==
        (table match {
          case "audit" => res.audit
          case "crawl_order" => res.crawlOrder
          case _ => res.records
        }).filter(col("wave") === w).count(),
        s"$table wave=$w delta incomplete")
    }
    // seen deltas (url-only) partition the final seen set exactly
    val seenUnion = (0 until 3)
      .map(w => spark.read.parquet(s"$dir/delta/seen/wave=$w"))
      .reduce(_ union _)
    assert(seenUnion.count() == seenUnion.distinct().count())
    assert(seenUnion.count() == res.seen.count())
  }

  test("time travel: asOf(wave) reads exactly what wave N committed") {
    val dir = Files.createTempDirectory("graft-state-tt").toString
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 5)
    val res = CrawlJob.run(spark, spec, pagesDf, stateDir = Some(dir))

    // accumulator as of wave 2 = all increments ≤ 2, untouched by waves 3-4
    val recAsOf2 = StateStore.asOf(spark, dir, 2, "records", delta = true).get
    assert(recAsOf2.collect().map(_.toString).toSet ==
      res.records.filter(col("wave") <= 2).collect().map(_.toString).toSet)

    // snapshot table as of wave 1 = the live frontier wave 1 committed
    val frontier1 = StateStore.asOf(spark, dir, 1, "frontier", delta = false)
    assert(frontier1.exists(_.count() > 0))

    // an uncommitted wave is invisible
    assert(StateStore.asOf(spark, dir, 99, "records", delta = true).isEmpty)
  }

  test("legacy pre-delta checkpoint fails LOUDLY instead of resuming empty") {
    // round-3 advice: the old layout stored accumulators as wave=N
    // snapshots; the delta reader would silently resume with an empty seen
    // set (re-fetching everything) and drop all prior records
    val dir = Files.createTempDirectory("graft-state-legacy").toString
    import spark.implicits._
    val legacySeen = Seq("http://quotes.toscrape.com/").toDF("url")
    val legacyFrontier = Seq.empty[(String, String)].toDF("url", "host")
    StateStore.commitWave(dir, 0, snapshots = Map(
      "frontier" -> legacyFrontier, "robot_rules" -> legacyFrontier,
      "seen" -> legacySeen)) // seen as a SNAPSHOT = the legacy layout
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 3)
    val e = intercept[IllegalStateException] {
      CrawlJob.run(spark, spec, pagesDf, stateDir = Some(dir))
    }
    assert(e.getMessage.contains("legacy pre-delta layout"))
  }

  test("delta compaction: resume after compactDeltas is byte-identical, " +
      "crashed-compactor leftovers are ignored, expired history fails loudly") {
    val dir = Files.createTempDirectory("graft-state-compact").toString
    val full = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 20)
    val direct = CrawlJob.run(spark, full, pagesDf)
    val directRecs = direct.records.orderBy(col("wave"), col("rank"), col("seq"))
      .select("json").collect().map(_.getString(0)).toSeq

    // crash after 5 waves, then run the maintenance compactor on every
    // accumulator (the Iceberg rewrite_data_files + expiration analog)
    CrawlJob.run(spark, full.copy(maxWaves = 5), pagesDf, stateDir = Some(dir))
    val w = StateStore.latestCommitted(dir).get
    Seq("seen", "records", "audit", "crawl_order")
      .foreach(t => StateStore.compactDeltas(spark, dir, t, w))
    // covered wave dirs are gone; one base remains
    val seenDir = new java.io.File(s"$dir/delta/seen")
    assert(seenDir.listFiles().map(_.getName).sorted.toSeq == Seq(s"base=$w"))

    // a crashed SECOND compactor: stray tmp dir + a re-materialized covered
    // wave dir must both be invisible to readers
    Files.createDirectories(java.nio.file.Paths.get(
      s"$dir/delta/seen/_base_tmp_99"))
    StateStore.read(spark, dir, w, "frontier").limit(1).write
      .mode("overwrite").parquet(s"$dir/delta/records/wave=0")

    val resumed = CrawlJob.run(spark, full, pagesDf, stateDir = Some(dir))
    val resumedRecs = resumed.records.orderBy(col("wave"), col("rank"), col("seq"))
      .select("json").collect().map(_.getString(0)).toSeq
    assert(resumedRecs == directRecs)
    assert(resumed.seen.collect().map(_.getString(0)).toSet ==
      direct.seen.collect().map(_.getString(0)).toSet)

    // time travel below the compaction horizon is EXPIRED — loud failure,
    // never a silent over-read
    val ex = intercept[IllegalStateException] {
      StateStore.readDeltas(spark, dir, "seen", w - 1)
    }
    assert(ex.getMessage.contains("compacted"))
  }

  test("resume with nothing committed starts cold") {
    val dir = Files.createTempDirectory("graft-state-empty").toString
    val spec = CrawlSpec(startUrls = Seq(SiteFixtures.QuotesBase),
      parserId = "quotes", maxWaves = 2)
    val res = CrawlJob.run(spark, spec, pagesDf, stateDir = Some(dir))
    assert(res.records.count() == 20)
    assert(StateStore.latestCommitted(dir).contains(1))
  }
}
