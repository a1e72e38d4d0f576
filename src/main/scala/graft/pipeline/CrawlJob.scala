package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.model.CrawlSpec
import graft.state.StateStore
import graft.url.UrlOps

/** The crawl engine: Geziyor's whole goroutine pipeline re-expressed as a
  * deterministic micro-batch loop of DataFrame transforms (SURVEY.md §3.1).
  *
  * One wave = one BFS generation:
  *   frontier → politeness token grant (per-host ranking window)
  *            → robots gate (broadcast join vs incrementally-fetched rules)
  *            → fetch join vs pages corpus (with transparent redirect
  *              following, bounded by maxRedirect)
  *            → retryable statuses re-enqueued (retry ≤ retryTimes)
  *            → decode + parse (records out, links out)
  *            → discovered links: AllowedDomains filter → intra-wave
  *              first-wins dedup → anti-join vs seen set → next frontier
  *
  * Middleware-order fidelity (geziyor.go:63-68,121-125): AllowedDomains runs
  * BEFORE dedup (blocked-domain urls never enter the seen set); robots runs
  * AFTER dedup (blocked urls ARE in the seen set); retries re-enter the
  * client only (no re-dedup, no politeness token, middleware chain not
  * re-run — client/client.go:94-121 recursion semantics).
  *
  * Scale design: every per-wave step is a narrow DataFrame op —
  *  - the seen-set anti-join and fetch join both shuffle on url, so AQE can
  *    reuse/coalesce partitions; at 10^10 urls the seen set lives in the
  *    Parquet state table, Bloom-prefiltered (graft.state.SeenSet);
  *  - the politeness window shuffles on host; mega-hosts are bounded because
  *    the window only ranks up to k winners per host (rank filter pushes
  *    into the window's sort), and skew salting applies upstream;
  *  - robots rules are one row per host → broadcast;
  *  - per-wave `localCheckpoint` truncates lineage so plan analysis stays
  *    O(1) in wave count (on a cluster: reliable checkpoint / state table).
  */
object CrawlJob {

  final case class CrawlResult(
      records: DataFrame,    // wave, rank, seq, json
      audit: DataFrame,      // wave, kind, method, status, host, url, detail
      seen: DataFrame,       // url
      crawlOrder: DataFrame, // wave, rank, url  (issued fetches, determ. order)
      metrics: DataFrame,    // wave, metric, value — per-wave counters
      lineage: DataFrame,    // wave, partition_id, n_rows — granted-set lineage
      waves: Int)

  private val RedirectStatuses = Seq(301, 302, 303, 307, 308)

  /** Simple robots.txt parser: Disallow prefixes in the `User-agent: *`
    * group (the subset the reference's robotstxt lib exercises in its test,
    * geziyor_test.go:331-339). Empty Disallow = allow-all.
    */
  def parseRobots(body: String): Seq[String] = {
    var inStar = false
    val out = Seq.newBuilder[String]
    body.linesIterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val lower = line.toLowerCase
      if (lower.startsWith("user-agent:"))
        inStar = line.substring("user-agent:".length).trim == "*"
      else if (inStar && lower.startsWith("disallow:")) {
        val p = line.substring("disallow:".length).trim
        if (p.nonEmpty) out += p
      }
    }
    out.result()
  }

  def run(
      spark: SparkSession,
      spec: CrawlSpec,
      pages: DataFrame,
      parsers: Map[String, Parser] = Parsers.registry,
      stateDir: Option[String] = None,
      seedsDf: Option[DataFrame] = None): CrawlResult = {
    import spark.implicits._

    val hostOfU = udf((u: String) => UrlOps.hostOf(u))
    val pathOfU = udf((u: String) => UrlOps.pathOf(u))

    // fetch-relevant corpus projection (Catalyst prunes the parquet scan to
    // these columns when `pages` comes from files)
    val corpus = pages.select(
      col("url").as("p_url"), col("status").as("p_status"),
      col("content_type").as("p_ct"), col("location").as("p_loc"),
      col("html").as("p_html"))

    val emptyAudit = Seq.empty[(Int, String, String, Int, String, String, String)]
      .toDF("wave", "kind", "method", "status", "host", "url", "detail")
    val emptyRecords = Seq.empty[(Int, Long, Int, String)]
      .toDF("wave", "rank", "seq", "json")
    val emptyOrder = Seq.empty[(Int, Long, String)].toDF("wave", "rank", "url")
    val emptyRules = Seq.empty[(String, Seq[String])].toDF("r_host", "prefixes")
    val emptyFrontier = Seq
      .empty[(String, String, String, Int, String, Map[String, String], Int, Int, Int, Long, String, Boolean)]
      .toDF("url", "host", "path", "depth", "method", "meta", "retry",
        "priority", "wave", "rank", "parser_id", "is_retry")

    // ---- resume or cold start -------------------------------------------
    var startWave = 0
    var frontier = emptyFrontier
    var seen = emptyFrontier.select(col("url"))
    var records = emptyRecords
    var audit = emptyAudit
    var order = emptyOrder
    var robotRules = emptyRules // (r_host, prefixes) for hosts seen so far

    val resumed = stateDir.flatMap(StateStore.latestCommitted)
    resumed match {
      case Some(w) =>
        val dir = stateDir.get
        frontier = StateStore.read(spark, dir, w, "frontier")
        seen = StateStore.read(spark, dir, w, "seen")
        records = StateStore.read(spark, dir, w, "records")
        audit = StateStore.read(spark, dir, w, "audit")
        order = StateStore.read(spark, dir, w, "crawl_order")
        robotRules = StateStore.read(spark, dir, w, "robot_rules")
        startWave = w + 1
      case None =>
        // Seeds pass AllowedDomains + dedup exactly like discovered urls
        // (the reference runs seeds through the same middleware chain).
        // Seed source: a driver-side StartURLs list (parity mode, ordered)
        // or a seeds DataFrame with a `url` column (scale mode — a 10^10
        // frontier seed list is a table, not a Seq).
        val seedsRaw = seedsDf match {
          case Some(df) =>
            val bw = Window
              .partitionBy(pmod(hash(col("url")), lit(1024)))
              .orderBy(col("url"))
            df.select(col("url")).withColumn("host", hostOfU(col("url")))
              .withColumn("path", pathOfU(col("url")))
              .withColumn("depth", lit(0))
              .withColumn("method", lit("GET"))
              .withColumn("meta", map().cast("map<string,string>"))
              .withColumn("retry", lit(0))
              .withColumn("priority", lit(0))
              .withColumn("wave", lit(0))
              .withColumn("rank",
                pmod(hash(col("url")), lit(1024)).cast("long") *
                  lit(1L << 40) + row_number().over(bw).cast("long"))
              .withColumn("parser_id", lit(spec.parserId))
              .withColumn("is_retry", lit(false))
          case None =>
            spec.startUrls.zipWithIndex
              .map { case (u, i) =>
                (u, UrlOps.hostOf(u), UrlOps.pathOf(u), 0, "GET",
                  Map.empty[String, String], 0, 0, 0, i.toLong, spec.parserId,
                  false)
              }
              .toDF("url", "host", "path", "depth", "method", "meta", "retry",
                "priority", "wave", "rank", "parser_id", "is_retry")
        }
        val seedsAllowed =
          if (spec.allowedDomains.isEmpty) seedsRaw
          else seedsRaw.filter(col("host").isin(spec.allowedDomains: _*))
        frontier = seedsAllowed.dropDuplicates("url")
        seen = frontier.select(col("url"))
    }

    // per-wave counters + per-partition lineage of the granted set
    // (north-star: frontier mutations emit lineage + metrics to the audit
    // store). Tiny driver-side buffers — ≤ #partitions rows per wave.
    val metricsBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    val lineageBuf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Long)]

    // Per-wave persists live until the end of the crawl: the records/
    // audit/order accumulators union LAZY references into them, so each
    // wave's pipeline materializes exactly once (at its own checkpoint
    // points), and the accumulated outputs are folded ONCE at loop exit.
    val persisted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Dataset[_]]

    val debug = sys.env.contains("GRAFT_WAVE_DEBUG")
    def dbg(tag: String, t0: Long): Long = {
      val t = System.nanoTime()
      if (debug) println(f"[wave-debug] $tag%-24s ${(t - t0) / 1e9}%8.2fs")
      t
    }

    var wave = startWave
    var done = false
    frontier = frontier.localCheckpoint(true)
    while (!done && wave < spec.maxWaves) {
      if (frontier.isEmpty) { done = true }
      else {
        var tMark = System.nanoTime()
        if (debug) println(s"[wave-debug] ==== wave $wave ====")
        // ---- politeness: grant ≤ k tokens per host this wave ------------
        // (retries bypass the token budget — the reference retries inside
        // the client without re-running the delay middleware)
        val (granted, deferred) =
          if (spec.hostTokensPerWave == Int.MaxValue)
            (frontier, emptyFrontier)
          else {
            val nonRetry = frontier.filter(!col("is_retry"))
            // Two-phase salted ranking: phase 1 ranks within (host, salt) and
            // keeps ≤k per bucket — the global per-host top-k (by the same
            // total order) is always a subset of the per-salt survivors, so
            // phase 2 over ≤ k·S rows/host is EXACT while the mega-host's
            // window work spreads across S tasks (SURVEY.md §7 skew note).
            val cols = emptyFrontier.columns.map(col).toIndexedSeq
            val (phase1, deferredA) =
              if (spec.skewSaltBuckets > 1) {
                val salted = nonRetry
                  .withColumn("salt",
                    pmod(hash(col("url")), lit(spec.skewSaltBuckets)))
                  .withColumn("t1", row_number().over(
                    Window.partitionBy(col("host"), col("salt"))
                      .orderBy(col("priority").desc, col("rank").asc)))
                (salted.filter(col("t1") <= spec.hostTokensPerWave)
                   .select(cols: _*),
                 salted.filter(col("t1") > spec.hostTokensPerWave)
                   .select(cols: _*))
              } else (nonRetry, emptyFrontier)
            val tw = Window.partitionBy(col("host"))
              .orderBy(col("priority").desc, col("rank").asc)
            val ranked2 = phase1.withColumn("tok", row_number().over(tw))
            val grantedNR = ranked2.filter(col("tok") <= spec.hostTokensPerWave)
              .select(cols: _*)
            val g = grantedNR.union(frontier.filter(col("is_retry")))
            // deferred = phase-1 drops ∪ phase-2 drops (no join needed)
            val d = deferredA.union(
              ranked2.filter(col("tok") > spec.hostTokensPerWave)
                .select(cols: _*))
            (g, d)
          }

        // ---- global concurrency cap (geziyor.go:109-111 semaphore → wave
        // size cap; RequestsPerSecond × waveInterval collapses to the same
        // bound in wave mode). Like politeness, excess is deferred, never
        // dropped.
        val auditInc = scala.collection.mutable.ArrayBuffer
          .empty[DataFrame]

        val waveCap = spec.concurrentRequests.toLong
        val (granted2, deferred2) =
          if (waveCap >= Int.MaxValue)
            (granted, deferred)
          else {
            val gw = Window.orderBy(col("rank").asc)
            val ranked = granted.withColumn("gidx", row_number().over(gw))
            val g2 = ranked.filter(col("gidx") <= waveCap).drop("gidx")
            val d2 = ranked.filter(col("gidx") > waveCap).drop("gidx")
            (g2, deferred.union(d2))
          }

        // ---- robots: incrementally fetch rules for NEW hosts ------------
        if (!spec.robotsTxtDisabled) {
          val newHosts = granted2.select(col("host")).distinct()
            .join(robotRules, col("host") === col("r_host"), "left_anti")
          val fetched = newHosts
            .join(corpus,
              concat(lit("http://"), col("host"), lit("/robots.txt")) === col("p_url"),
              "left")
            .select(col("host"),
              when(col("p_status") === 200, col("p_html")).as("body"))
          val parseRobotsU = udf((b: Array[Byte]) =>
            if (b == null) Seq.empty[String]
            else parseRobots(new String(b, java.nio.charset.StandardCharsets.UTF_8)))
          val newRules = fetched
            .select(col("host").as("r_host"), parseRobotsU(col("body")).as("prefixes"))
          robotRules = robotRules.union(newRules).localCheckpoint(true)
        }

        granted2.persist(StorageLevel.MEMORY_AND_DISK)
        deferred2.persist(StorageLevel.MEMORY_AND_DISK)

        val (robotsOk, robotsBlocked) =
          if (spec.robotsTxtDisabled) (granted2, emptyFrontier)
          else {
            val isBlocked = udf((path: String, prefixes: Seq[String]) =>
              prefixes != null && prefixes.exists(path.startsWith))
            val j = granted2.join(broadcast(robotRules),
              col("host") === col("r_host"), "left")
            (j.filter(col("is_retry") ||
                !isBlocked(col("path"), col("prefixes")))
               .drop("r_host", "prefixes"),
             j.filter(!col("is_retry") &&
                isBlocked(col("path"), col("prefixes")))
               .drop("r_host", "prefixes"))
          }

        auditInc += (robotsBlocked.select(col("wave"), lit("robots_forbidden"),
          col("method"), lit(0), col("host"), col("url"), lit("")))

        // ---- fetch join with transparent redirect following -------------
        var pending = robotsOk
          .withColumn("cur_url", col("url")).withColumn("hops", lit(0))
          .localCheckpoint(true)

        tMark = dbg("politeness+robots+chk", tMark)
        // order/metrics/lineage read from the materialized pending set —
        // no recompute of the politeness/robots pipeline
        order = order.union(
          pending.select(col("wave"), col("rank"), col("url")))
        metricsBuf += ((wave, "frontier_size", frontier.count()))
        lineageBuf ++= pending.groupBy(spark_partition_id().as("pid"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => (wave, r.getInt(0), r.getLong(1)))
        var fetched = pending.limit(0)
          .withColumn("p_status", lit(null).cast("int"))
          .withColumn("p_ct", lit(null).cast("string"))
          .withColumn("p_html", lit(null).cast("binary"))
          .withColumn("redirect_exceeded", lit(false))
          .drop("p_loc")
        var hop = 0
        while (hop <= spec.maxRedirect && !pending.isEmpty) {
          val j = pending.join(corpus, col("cur_url") === col("p_url"), "left")
            .drop("p_url")
          val isRedir = col("p_status").isin(RedirectStatuses.map(Integer.valueOf): _*) &&
            col("p_loc").isNotNull
          val finals = j.filter(!isRedir || lit(hop == spec.maxRedirect))
            .withColumn("redirect_exceeded", isRedir)
            .drop("p_loc")
          fetched = fetched.union(finals)
          pending =
            if (hop == spec.maxRedirect) pending.limit(0)
            else j.filter(isRedir)
              .withColumn("cur_url", col("p_loc"))
              .withColumn("hops", col("hops") + 1)
              .drop("p_status", "p_ct", "p_html", "p_loc")
              .localCheckpoint(true)
          hop += 1
        }
        tMark = dbg("order+metrics+lineage", tMark)
        fetched = fetched.persist(StorageLevel.MEMORY_AND_DISK)

        // fetch misses = transport-error analog → ErrorFunc audit branch
        val misses = fetched.filter(col("p_status").isNull)
        auditInc += (misses.select(col("wave"), lit("fetch_miss"),
          col("method"), lit(-1), col("host"), col("url"),
          concat(lit("no such page: "), col("cur_url"))))
        auditInc += (fetched.filter(col("redirect_exceeded"))
          .select(col("wave"), lit("redirect_exceeded"), col("method"),
            col("p_status"), col("host"), col("url"),
            lit(s"stopped after ${spec.maxRedirect} redirects")))

        // ---- retry re-enqueue -------------------------------------------
        val retryCodes = spec.retryHttpCodes.toSeq.map(Integer.valueOf)
        val retryable = fetched.filter(
          col("p_status").isin(retryCodes: _*) && !col("redirect_exceeded"))
        val requeue = retryable.filter(col("retry") < spec.retryTimes)
          .select(col("url"), col("host"), col("path"), col("depth"),
            col("method"), col("meta"), (col("retry") + 1).as("retry"),
            col("priority"), (col("wave") + 1).as("wave"), col("rank"),
            col("parser_id"), lit(true).as("is_retry"))
        auditInc += (retryable.filter(col("retry") < spec.retryTimes)
          .select(col("wave"), lit("retry"), col("method"), col("p_status"),
            col("host"), col("url"), concat(lit("attempt "), col("retry") + 1)))
        auditInc += (retryable.filter(col("retry") >= spec.retryTimes)
          .select(col("wave"), lit("retry_exhausted"), col("method"),
            col("p_status"), col("host"), col("url"),
            lit(s"gave up after ${spec.retryTimes} retries")))

        // ---- deliver responses → decode → parse --------------------------
        val responses = fetched.filter(col("p_status").isNotNull &&
          !col("p_status").isin(retryCodes: _*) && !col("redirect_exceeded"))
        auditInc += (responses.select(col("wave"), lit("crawled"),
          col("method"), col("p_status"), col("host"), col("url"), lit("")))

        val reg = parsers
        val maxBody = spec.maxBodySize
        val parseHtmlDisabled = spec.parseHtmlDisabled
        val parsed = responses
          .select(col("url"), col("cur_url"), col("host"), col("depth"),
            col("method"), col("meta"), col("wave"), col("rank"),
            col("parser_id"), col("p_status"), col("p_ct"), col("p_html"))
          .as[(String, String, String, Int, String, Map[String, String], Int,
            Long, String, Int, String, Array[Byte])]
          .mapPartitions { it =>
            it.map { case (url, finalUrl, host, depth, method, meta, w, rank,
                parserId, status, ct, html) =>
              val body = CharsetDecode.truncate(html, maxBody)
              val isHead = method == "HEAD"
              val text =
                if (isHead) "" else CharsetDecode.decode(body, ct)
              val html4Parse = CharsetDecode.isHtml(ct) && !parseHtmlDisabled
              Parsers.safeParse(reg)(parserId, finalUrl, text, html4Parse, meta) match {
                case Right(out) => (url, host, depth, meta, w, rank, parserId,
                  out.records, out.links.map(d => (d.url, d.parserId)), null: String)
                case Left(err) => (url, host, depth, meta, w, rank, parserId,
                  Seq.empty[String], Seq.empty[(String, String)], err)
              }
            }
          }
          .toDF("url", "host", "depth", "meta", "wave", "rank", "parser_id",
            "records", "links", "parse_error")
          .persist(StorageLevel.MEMORY_AND_DISK)

        tMark = dbg("fetch-loop(lazy)", tMark)
        auditInc += (parsed.filter(col("parse_error").isNotNull)
          .select(col("wave"), lit("parse_error"), lit("GET"), lit(0),
            col("host"), col("url"), col("parse_error")))

        records = records.union(parsed
          .select(col("wave"), col("rank"),
            posexplode(col("records")).as(Seq("seq", "json"))))

        // ---- discovered links → next frontier ----------------------------
        val cand = parsed
          .select(col("rank").as("parent_rank"), col("depth"), col("meta"),
            posexplode(col("links")).as(Seq("link_pos", "link")))
          .select(col("link._1").as("url"), col("link._2").as("parser_id"),
            col("parent_rank"), col("link_pos"),
            (col("depth") + 1).as("depth"), col("meta"))
          .filter(col("depth") <= spec.maxDepth)
          .withColumn("host", hostOfU(col("url")))
          .withColumn("path", pathOfU(col("url")))

        val (candAllowed, candRejected) =
          if (spec.allowedDomains.isEmpty) (cand, cand.limit(0))
          else (cand.filter(col("host").isin(spec.allowedDomains: _*)),
            cand.filter(!col("host").isin(spec.allowedDomains: _*)))
        auditInc += (candRejected
          .select(lit(wave), lit("rejected_domain"), lit("GET"), lit(0),
            col("host"), col("url"), lit("")))

        // intra-wave first-wins dedup (duplicate_requests.go:18 LoadOrStore)
        val dw = Window.partitionBy(col("url"))
          .orderBy(col("parent_rank").asc, col("link_pos").asc)
        val candDeduped = candAllowed
          .withColumn("rn", row_number().over(dw))
          .filter(col("rn") === 1).drop("rn")

        // seen-set anti-join (GETs only; URLRevisitEnabled disables).
        // bloomDedup = the 10^10-scale path: broadcast Bloom prefilter, then
        // exact anti-join only over the maybe-seen rows.
        val candNew =
          if (spec.urlRevisitEnabled) candDeduped
          else if (spec.bloomDedup)
            graft.state.SeenSet.filterNew(candDeduped,
              graft.state.SeenSet.build(seen, seen.count()))
          else candDeduped.join(seen, Seq("url"), "left_anti")

        // deterministic discovery rank (sync-order mode; geziyor.go:225-227).
        // Next-wave ranks are made unique across the three sources by group
        // offsets: deferred (oldest pending) < retries < new discoveries —
        // so the (wave, rank) record key is always a total order.
        // discovery rank: sync-order mode = one global window (exact
        // reference order, parity/test mode); scale mode = bucketed windows
        // (unique + deterministic, P-way parallel, not a global total order)
        val RankBuckets = 1024
        val ranked0 =
          if (spec.syncOrder) {
            val rw = Window.orderBy(col("parent_rank").asc, col("link_pos").asc)
            candNew.withColumn("rank", row_number().over(rw).cast("long"))
          } else {
            val bw = Window
              .partitionBy(pmod(hash(col("url")), lit(RankBuckets)))
              .orderBy(col("parent_rank").asc, col("link_pos").asc)
            candNew.withColumn("rank",
              pmod(hash(col("url")), lit(RankBuckets)).cast("long") *
                lit(1L << 40) + row_number().over(bw).cast("long"))
          }
        val nextFrontier = ranked0
          .select(col("url"), col("host"), col("path"), col("depth"),
            lit("GET").as("method"), col("meta"), lit(0).as("retry"),
            lit(0).as("priority"), lit(wave + 1).as("wave"), col("rank"),
            col("parser_id"), lit(false).as("is_retry"))

        tMark = dbg("records-chk", tMark)
        // candNew is unique per wave and anti-joined against seen, so the
        // increment needs no distinct; checkpoint only the increment (the
        // accumulated union of materialized pieces stays cheap) — read it
        // from candNew to skip the discovery-rank window entirely
        seen = seen.union(
          candNew.select(col("url")).localCheckpoint(true))
        tMark = dbg("seen-increment-chk", tMark)
        val assembled = deferred2.withColumn("wave", col("wave") + 1)
          .withColumn("grp", lit(0))
          .union(requeue.withColumn("grp", lit(1)))
          .union(nextFrontier.withColumn("grp", lit(2)))
        frontier = {
          if (spec.syncOrder) {
            val fw = Window.orderBy(col("grp").asc, col("rank").asc)
            assembled.withColumn("rank", row_number().over(fw).cast("long"))
          } else {
            val bw = Window
              .partitionBy(pmod(hash(col("url")), lit(RankBuckets)))
              .orderBy(col("grp").asc, col("rank").asc)
            assembled.withColumn("rank",
              pmod(hash(col("url")), lit(RankBuckets)).cast("long") *
                lit(1L << 40) + row_number().over(bw).cast("long"))
          }
        }.drop("grp")
          .localCheckpoint(true)
        tMark = dbg("frontier-assembly-chk", tMark)
        audit = audit.union(auditInc.reduce(_ union _))
        tMark = dbg("audit-fold-chk", tMark)

        persisted += fetched
        persisted += parsed
        granted2.unpersist()
        deferred2.unpersist()

        stateDir.foreach { dir =>
          StateStore.commitWave(dir, wave, Map(
            "frontier" -> frontier, "seen" -> seen, "records" -> records,
            "audit" -> audit, "crawl_order" -> order,
            "robot_rules" -> robotRules))
        }
        wave += 1
      }
    }

    // single final materialization of the accumulated outputs, then release
    // the per-wave caches they were computed from
    records = records.localCheckpoint(true)
    audit = audit.localCheckpoint(true)
    order = order.localCheckpoint(true)
    persisted.foreach(_.unpersist())

    val auditMetrics = audit.groupBy(col("wave"), col("kind").as("metric"))
      .agg(count(lit(1)).as("value"))
    val metrics = auditMetrics.union(
      metricsBuf.toSeq.toDF("wave", "metric", "value"))
    val lineage = lineageBuf.toSeq.toDF("wave", "partition_id", "n_rows")
    CrawlResult(records, audit, seen, order, metrics, lineage, wave)
  }
}
