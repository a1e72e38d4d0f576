package graft.metrics

import org.apache.spark.sql.DataFrame
import graft.sinks.{JInt, JObj, Json}

/** Metrics exposition — the corpus-mode analog of the reference's
  * Prometheus / ExpVar exporters (metrics/metrics.go:37-60: request/response
  * counters by method/status, robotstxt-forbidden, panic counters, exposed
  * at /metrics). The engine's counters live in `CrawlResult.metrics`
  * (wave, metric, value — audit-kind counts plus frontier sizes); these
  * formatters render that tiny aggregated table in the two wire formats the
  * reference supports. `collect()` here is on a post-aggregation table of
  * ≤ kinds×waves rows — never the frontier.
  */
object Exposition {

  private def rows(metrics: DataFrame): Seq[(String, Int, Long)] =
    metrics.collect()
      .map(r => (r.getString(1), r.getInt(0), r.getLong(2)))
      .sortBy { case (m, w, _) => (m, w) }.toSeq

  private def sanitize(name: String): String =
    name.toLowerCase.map(c => if (c.isLetterOrDigit) c else '_')

  /** Prometheus text exposition format: one counter family per metric kind,
    * labeled by wave, plus the all-waves total.
    */
  def prometheus(metrics: DataFrame, namespace: String = "geziyorspark"): String = {
    val rs = rows(metrics)
    val sb = new StringBuilder
    rs.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (metric, ms) =>
      val fam = s"${namespace}_${sanitize(metric)}_total"
      sb.append(s"# TYPE $fam counter\n")
      ms.sortBy(_._2).foreach { case (_, wave, v) =>
        sb.append(s"""$fam{wave="$wave"} $v""").append('\n')
      }
      sb.append(s"$fam{wave=\"all\"} ${ms.map(_._3).sum}").append('\n')
    }
    sb.toString
  }

  /** ExpVar-style JSON (Go map-marshal byte conventions: sorted keys,
    * compact) — the `/debug/vars` face.
    */
  def expvarJson(metrics: DataFrame): String = {
    val totals = rows(metrics).groupBy(_._1).toSeq
      .map { case (m, ms) => m -> JInt(ms.map(_._3).sum) }
    Json.compact(JObj(totals))
  }
}
