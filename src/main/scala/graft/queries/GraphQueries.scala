package graft.queries

import org.apache.spark.sql.functions._
import graft.corpus.CorpusViews

/** q59's per-host sitemap row (5 fields — past Encoders.tuple comfort). */
final case class SitemapHostRow(
    host: String, n_locs: Long, locs: String, lastmods: String,
    roundtrip_ok: Boolean)

/** q75's per-host index round-trip row. */
final case class SitemapIndexRow(
    host: String, n_shards: Int, n_locs: Int, locs: String,
    roundtrip_ok: Boolean)

/** Link-graph scheduling + seed-source queries: host-authority ranking
  * (graft.graph.HostRank) and sitemap ingestion (graft.sitemap.Sitemap) —
  * the two frontier-bootstrap operators a Common-Crawl-scale crawl runs
  * before and between fetch waves.
  */
object GraphQueries {
  import CorpusViews.{view, cte}

  private def v(s: org.apache.spark.sql.SparkSession, dir: String)(n: String) =
    view(s, dir, n)

  /** Host-authority priority (q58): 3 iterations of integer fixed-point
    * PageRank (damping 85/100, scale 10^6) over the host link graph — the
    * companion to q54's raw in-degree, and the priority key a scheduler
    * joins onto the frontier per host. The oracle unrolls the identical
    * integer recurrence as chained CTEs; every division is a floor-div of
    * non-negative integers, so the two engines agree bit-for-bit.
    * Scale: rank table is one row per HOST (bounded, broadcastable);
    * each iteration = edge⋈rank hash join + map-side-combined groupBy.
    */
  val qHostRank = Q(
    "q58_hostrank_priority",
    // pr is cast to decimal(38,0) for the driver's type-sensitive hash:
    // the oracle's final column is BIGINT + SUM(BIGINT), which DuckDB
    // widens to HUGEINT → arrow decimal128(38,0); Spark's long otherwise
    // lands as int64 and the hash fails on bit-identical values (r5
    // verdict's root cause). The oracle SQL itself is frozen.
    (s, dir) => graft.graph.HostRank.ranks(v(s, dir)("host_edges"))
      .select(col("host"), col("pr").cast("decimal(38,0)").as("pr")),
    Some(cte("host_edges") +
      """, hosts AS (
        |  SELECT src_host AS host FROM host_edges
        |  UNION
        |  SELECT dst_host AS host FROM host_edges
        |), ow AS (
        |  SELECT src_host, SUM(w) AS outw FROM host_edges GROUP BY src_host
        |), r0 AS (
        |  SELECT host, CAST(1000000 AS BIGINT) AS pr FROM hosts
        |), r1 AS (
        |  SELECT h.host AS host, CAST(150000 AS BIGINT)
        |    + COALESCE(SUM((85 * r.pr * e.w) // (100 * o.outw)), 0) AS pr
        |  FROM hosts h
        |  LEFT JOIN host_edges e ON e.dst_host = h.host
        |  LEFT JOIN ow o ON o.src_host = e.src_host
        |  LEFT JOIN r0 r ON r.host = e.src_host
        |  GROUP BY h.host
        |), r2 AS (
        |  SELECT h.host AS host, CAST(150000 AS BIGINT)
        |    + COALESCE(SUM((85 * r.pr * e.w) // (100 * o.outw)), 0) AS pr
        |  FROM hosts h
        |  LEFT JOIN host_edges e ON e.dst_host = h.host
        |  LEFT JOIN ow o ON o.src_host = e.src_host
        |  LEFT JOIN r1 r ON r.host = e.src_host
        |  GROUP BY h.host
        |), r3 AS (
        |  SELECT h.host AS host, CAST(150000 AS BIGINT)
        |    + COALESCE(SUM((85 * r.pr * e.w) // (100 * o.outw)), 0) AS pr
        |  FROM hosts h
        |  LEFT JOIN host_edges e ON e.dst_host = h.host
        |  LEFT JOIN ow o ON o.src_host = e.src_host
        |  LEFT JOIN r2 r ON r.host = e.src_host
        |  GROUP BY h.host
        |)
        |SELECT host, pr FROM r3""".stripMargin))

  /** Sitemap ingestion (q59): per host, WRITE the canonical sitemaps.org
    * urlset for its pages (entries in page_key order, lastmod = W3C date of
    * warc_ts), then PARSE it back with the real scanner and emit the parsed
    * document: loc count, md5 of the parsed locs and lastmods (document
    * order), and an in-row writer⇄parser round-trip flag — the q56 WARC
    * recipe applied to the seed-source side. The oracle reconstructs the
    * same digests with ordered string_agg; equality proves the parser
    * recovers exactly the written entry sequence on multi-KB real documents.
    * Scale: one groupBy(host) shuffle to assemble each host's document
    * (bounded by pages-per-host), then a pure per-row map — no driver, no
    * second shuffle.
    */
  val qSitemap = Q(
    "q59_sitemap_roundtrip",
    (s, dir) => {
      import s.implicits._
      import graft.sitemap.Sitemap
      val grouped = v(s, dir)("pages")
        .select(col("host"), col("page_key"), col("url"),
          date_format(col("warc_ts"), "yyyy-MM-dd").as("lastmod"))
        .groupBy("host")
        .agg(sort_array(collect_list(
          struct(col("page_key"), col("url"), col("lastmod")))).as("es"))
        .as[(String, Seq[(Long, String, String)])]
      grouped.map { case (host, es) =>
        val entries = es.map(e => Sitemap.Entry(e._2, Some(e._3)))
        val xml = Sitemap.write(entries)
        val back = Sitemap.parse(xml)
        val ok = back == entries
        SitemapHostRow(host, back.length.toLong,
          back.map(_.loc).mkString("\n"),
          back.flatMap(_.lastmod).mkString("\n"), ok)
      }.toDF()
        .select(col("host"), col("n_locs"),
          md5(encode(col("locs"), "UTF-8")).as("locs_md5"),
          md5(encode(col("lastmods"), "UTF-8")).as("lastmods_md5"),
          col("roundtrip_ok"))
    },
    Some(cte("pages") +
      """SELECT host, COUNT(*) AS n_locs,
        |  md5(string_agg(url, chr(10) ORDER BY page_key)) AS locs_md5,
        |  md5(string_agg(strftime(warc_ts, '%Y-%m-%d'), chr(10) ORDER BY page_key)) AS lastmods_md5,
        |  TRUE AS roundtrip_ok
        |FROM pages GROUP BY host""".stripMargin))

  /** Sitemap INDEX round-trip (q75): the protocol's two-level form — every
    * site past 50k urls ships a `<sitemapindex>` whose `<sitemap>` blocks
    * point at shard urlsets. Per host, the fixture shards its pages by
    * page_key % 3 into shard urlsets plus an index document; the crawl side
    * then does exactly what a scheduler does: parse the INDEX, follow each
    * shard pointer, parse each SHARD urlset, flatten in (shard, entry)
    * order. The oracle reconstructs the same flattened sequence with
    * ordered string_agg; equality proves index parse → shard fan-out →
    * urlset parse recovers every written entry in order. Scale: one
    * groupBy(host) shuffle (bounded per-host payload) then a pure per-row
    * map — the q59 shape with the second protocol level on top.
    */
  val qSitemapIndex = Q(
    "q75_sitemap_index",
    (s, dir) => {
      import s.implicits._
      import graft.sitemap.Sitemap
      val grouped = v(s, dir)("pages")
        .select(col("host"), col("page_key"), col("url"))
        .groupBy("host")
        .agg(sort_array(collect_list(
          struct(col("page_key"), col("url")))).as("es"))
        .as[(String, Seq[(Long, String)])]
      grouped.map { case (host, es) =>
        val byShard = es.groupBy(_._1 % 3).toSeq.sortBy(_._1)
          .map { case (sh, ps) => (sh, ps.sortBy(_._1)) }
        val shardDocs = byShard.map { case (sh, ps) =>
          (s"http://$host/sitemap-$sh.xml",
            Sitemap.write(ps.map(p => Sitemap.Entry(p._2, None))))
        }.toMap
        val index = Sitemap.writeIndex(byShard.map { case (sh, _) =>
          Sitemap.Entry(s"http://$host/sitemap-$sh.xml", None)
        })
        // crawl side: parse the index, follow pointers, parse shards
        val shardLocs = Sitemap.parseIndex(index).map(_.loc)
        val flat = shardLocs.flatMap(l => Sitemap.parse(shardDocs(l)).map(_.loc))
        val expected = byShard.flatMap(_._2.map(_._2))
        SitemapIndexRow(host, shardLocs.length, flat.length,
          flat.mkString("\n"), flat == expected)
      }.toDF()
        .select(col("host"), col("n_shards"), col("n_locs"),
          md5(encode(col("locs"), "UTF-8")).as("locs_md5"),
          col("roundtrip_ok"))
    },
    Some(cte("pages") +
      """SELECT host,
        |  CAST(COUNT(DISTINCT page_key % 3) AS INT) AS n_shards,
        |  CAST(COUNT(*) AS INT) AS n_locs,
        |  md5(string_agg(url, chr(10) ORDER BY page_key % 3, page_key))
        |    AS locs_md5,
        |  TRUE AS roundtrip_ok
        |FROM pages GROUP BY host""".stripMargin))

  val all: Seq[Q] = Seq(qHostRank, qSitemap, qSitemapIndex)
}
