package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming face of the crawl engine: continuously arriving
  * URLs (a live frontier feed) flow through the same dedup/politeness/fetch
  * semantics as the batch waves.
  *
  *  - `dedupStream`: URL-seen dedup as keyed state (mapGroupsWithState) —
  *    the stream twin of the seen-set anti-join; state lives in the
  *    streaming state store, checkpointed like the batch state table.
  *  - `hostThrottle`: per-host token budget per micro-batch via
  *    flatMapGroupsWithState — the stream twin of the politeness window
  *    (SURVEY.md §2.2 delay middleware).
  *  - `foreachBatchCrawl`: the full wave step per micro-batch — persist the
  *    batch once, fan out to sinks (geziyor.go:326-364 exporter semantics).
  */
object StreamingCrawl {

  final case class UrlEvent(url: String, host: String, batchTs: Long)

  /** Emit each url the first time it's ever seen (across micro-batches). */
  def dedupStream(urls: Dataset[UrlEvent]): Dataset[String] = {
    import urls.sparkSession.implicits._
    urls.groupByKey(_.url)
      .mapGroupsWithState[Boolean, Option[String]](
        GroupStateTimeout.NoTimeout) {
        case (url, _, state: GroupState[Boolean]) =>
          if (state.exists) None
          else { state.update(true); Some(url) }
      }
      .flatMap(_.toSeq)
  }

  /** Grant at most `k` urls per host per micro-batch invocation; excess is
    * DEFERRED into state and re-emitted in later batches (politeness never
    * drops, it delays — middleware/delay.go semantics).
    */
  def hostThrottle(urls: Dataset[UrlEvent], k: Int): Dataset[String] = {
    import urls.sparkSession.implicits._
    urls.groupByKey(_.host)
      .flatMapGroupsWithState[List[String], String](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[List[String]]) =>
          val pending = state.getOption.getOrElse(Nil) ++
            it.map(_.url).toList
          val (grant, defer) = pending.splitAt(k)
          state.update(defer)
          grant.iterator
      }
  }

  /** Full micro-batch crawl step: per batch, dedup against the persistent
    * seen table, fetch-join the corpus, extract, fan out one persisted batch
    * to every sink.
    */
  def foreachBatchCrawl(
      spark: SparkSession,
      urlStream: DataFrame,     // streaming DF with `url` column
      pages: DataFrame,
      seenTablePath: String,
      sinks: Seq[DataFrame => Unit]) = {
    // Incremental Bloom across micro-batches (the closure lives for the
    // query lifetime): bootstrap once from the persisted seen table, then
    // absorb each batch's fresh urls via associative mergeInPlace — the
    // same no-per-batch-rebuild rule as the batch wave loop (CrawlJob).
    var bloomState: Option[graft.state.SeenSet.BloomState] = None
    urlStream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val seenExists = new java.io.File(seenTablePath).exists()
        val seen =
          if (seenExists) spark.read.parquet(seenTablePath)
          else batch.sparkSession.emptyDataFrame.withColumn("url", lit(""))
            .limit(0)
        val batchUrls = batch.select(col("url")).distinct()
        // same scale story as the batch path (graft.state.SeenSet): Bloom
        // prefilter skips the anti-join shuffle for the definitely-new
        // majority; the exact anti-join runs only on maybe-seen rows.
        val fresh =
          if (seenExists) {
            if (bloomState.isEmpty || bloomState.exists(_.overfull))
              bloomState =
                Some(graft.state.SeenSet.buildState(seen, seen.count()))
            graft.state.SeenSet.filterNew(batchUrls,
              graft.state.SeenSet.Layered(bloomState.get.bloom, seen))
          } else batchUrls
        val fetched = fresh.join(
          pages.select(col("url"), col("status"), col("text")),
          Seq("url"), "left")
        fetched.persist()
        try {
          sinks.foreach(_(fetched))
          fresh.write.mode("append").parquet(seenTablePath)
          // fresh is persisted via fetched's cache — count is cheap; the
          // merged filter covers this batch's appends for the next batch
          bloomState = bloomState.map(st =>
            graft.state.SeenSet.mergeIncrement(st, fresh, fresh.count()))
        } finally fetched.unpersist()
        ()
      }
  }
}
