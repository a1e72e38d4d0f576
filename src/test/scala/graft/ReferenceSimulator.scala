package graft

import scala.collection.mutable
import graft.fixtures.SiteFixtures
import graft.model.CrawlSpec
import graft.pipeline.{CharsetDecode, Parser, Parsers}

/** Independent sequential re-implementation of the crawl semantics —
  * plain queues and sets, no Spark — modeling the reference's deterministic
  * skeleton (synchronized mode, geziyor.go:225-227): BFS waves, first-wins
  * dedup, middleware order AllowedDomains → dedup → politeness → robots →
  * fetch(redirects, retry) → parse. Used as the oracle for CrawlJobSpec:
  * if the distributed DataFrame pipeline and this little interpreter agree
  * on records / seen set / crawl order, the join/window realization is
  * faithful.
  */
object ReferenceSimulator {

  final case class SimResult(
      records: Seq[String],           // in (wave, rank, seq) order
      seen: Set[String],
      order: Seq[(Int, String)],      // (wave, url) issued fetches in order
      auditKinds: Map[String, Int],
      waves: Int)

  final case class Req(url: String, host: String, path: String, depth: Int,
      retry: Int, priority: Int, rank: Long, parserId: String,
      isRetry: Boolean)

  def crawl(spec: CrawlSpec,
      pages: Map[String, SiteFixtures.Page],
      parsers: Map[String, Parser] = Parsers.registry): SimResult = {
    import graft.url.UrlOps

    val redirectStatuses = Set(301, 302, 303, 307, 308)
    val seen = mutable.Set.empty[String]
    val records = mutable.ArrayBuffer.empty[String]
    val order = mutable.ArrayBuffer.empty[(Int, String)]
    val audit = mutable.Map.empty[String, Int].withDefaultValue(0)
    val robotRules = mutable.Map.empty[String, Seq[graft.pipeline.RobotsRules.Rule]]

    def allowed(host: String) =
      spec.allowedDomains.isEmpty || spec.allowedDomains.contains(host)

    var frontier: Seq[Req] = spec.startUrls.zipWithIndex
      .map { case (u, i) =>
        Req(u, UrlOps.hostOf(u), UrlOps.pathOf(u), 0, 0, 0, i.toLong,
          spec.parserId, isRetry = false)
      }
      .filter(r => allowed(r.host))
      .foldLeft(Vector.empty[Req]) { (acc, r) =>
        if (acc.exists(_.url == r.url)) acc else acc :+ r
      }
    frontier.foreach(r => seen += r.url)

    var wave = 0
    while (frontier.nonEmpty && wave < spec.maxWaves) {
      // politeness: ≤ k tokens per host, by (priority desc, rank asc);
      // retries bypass
      val (granted, deferred) =
        if (spec.hostTokensPerWave == Int.MaxValue) (frontier, Seq.empty[Req])
        else {
          val g = mutable.ArrayBuffer.empty[Req]
          val d = mutable.ArrayBuffer.empty[Req]
          frontier.filter(_.isRetry).foreach(g += _)
          frontier.filterNot(_.isRetry).groupBy(_.host).foreach { case (_, rs) =>
            val sorted = rs.sortBy(r => (-r.priority, r.rank))
            g ++= sorted.take(spec.hostTokensPerWave)
            d ++= sorted.drop(spec.hostTokensPerWave)
          }
          (g.toSeq, d.toSeq)
        }

      // global concurrency cap: wave size bound, excess deferred by rank
      val (granted2, deferredCap) =
        if (spec.concurrentRequests >= Int.MaxValue) (granted, Seq.empty[Req])
        else {
          val sorted = granted.sortBy(_.rank)
          (sorted.take(spec.concurrentRequests),
            sorted.drop(spec.concurrentRequests))
        }
      val deferredAll = deferred ++ deferredCap

      val requeued = mutable.ArrayBuffer.empty[Req]
      val discovered = mutable.ArrayBuffer.empty[(Long, Int, Req)] // (parentRank, pos, req)

      granted2.sortBy(_.rank).foreach { r =>
        // robots (retries bypass; rules fetched lazily per host)
        val blocked = !spec.robotsTxtDisabled && !r.isRetry && {
          val rules = robotRules.getOrElseUpdate(r.host,
            pages.get(s"http://${r.host}/robots.txt")
              .map(p => graft.pipeline.RobotsRules.fromStatus(p.status,
                new String(p.html, java.nio.charset.StandardCharsets.UTF_8),
                spec.userAgent))
              .getOrElse(Seq.empty))
          !graft.pipeline.RobotsRules.allowed(r.path, rules)
        }
        if (blocked) audit("robots_forbidden") += 1
        else {
          order += ((wave, r.url))
          // fetch with transparent redirects
          var cur = r.url
          var hops = 0
          var page = pages.get(cur)
          var exceeded = false
          while (!exceeded && page.exists(p =>
              redirectStatuses.contains(p.status) && p.location != null)) {
            if (hops == spec.maxRedirect) exceeded = true
            else { cur = page.get.location; page = pages.get(cur); hops += 1 }
          }
          if (exceeded) audit("redirect_exceeded") += 1
          else page match {
            case None => audit("fetch_miss") += 1
            case Some(p) if spec.retryHttpCodes.contains(p.status) &&
                r.retry < spec.retryTimes =>
              audit("retry") += 1
              requeued += r.copy(retry = r.retry + 1, isRetry = true)
            case Some(p) =>
              // retry-EXHAUSTED retryable statuses are still delivered to
              // the callback (client/client.go:111-117 returns the response;
              // only transport errors route to ErrorFunc, geziyor.go:247-253)
              if (spec.retryHttpCodes.contains(p.status))
                audit("retry_exhausted") += 1
              audit("crawled") += 1
              val body = CharsetDecode.truncate(p.html, spec.maxBodySize)
              val text = CharsetDecode.decode(body, p.contentType)
              val isHtml = CharsetDecode.isHtml(p.contentType) &&
                !spec.parseHtmlDisabled
              Parsers.safeParse(parsers)(r.parserId, cur, text, isHtml,
                Map.empty) match {
                case Left(_) => audit("parse_error") += 1
                case Right(out) =>
                  records ++= out.records
                  out.links.zipWithIndex.foreach { case (d, pos) =>
                    discovered += ((r.rank, pos,
                      Req(d.url, UrlOps.hostOf(d.url), UrlOps.pathOf(d.url),
                        r.depth + 1, 0, 0, 0L, d.parserId, isRetry = false)))
                  }
              }
          }
        }
      }

      // discovered links: depth cap → allowed → first-wins dedup → seen
      val inOrder = discovered.sortBy { case (pr, pos, _) => (pr, pos) }
        .map(_._3).filter(_.depth <= spec.maxDepth)
      val kept = mutable.ArrayBuffer.empty[Req]
      val inWave = mutable.Set.empty[String]
      inOrder.foreach { c =>
        if (!allowed(c.host)) audit("rejected_domain") += 1
        else if (!inWave.contains(c.url) &&
            (spec.urlRevisitEnabled || !seen.contains(c.url))) {
          inWave += c.url
          kept += c
          if (!spec.urlRevisitEnabled) seen += c.url else seen += c.url
        }
      }

      // next frontier ordering: deferred, then retries, then new; re-rank 1..n
      val next = (deferredAll.sortBy(_.rank) ++ requeued.sortBy(_.rank) ++ kept)
        .zipWithIndex.map { case (r, i) => r.copy(rank = (i + 1).toLong) }
      frontier = next
      wave += 1
    }

    SimResult(records.toSeq, seen.toSet, order.toSeq, audit.toMap, wave)
  }
}
