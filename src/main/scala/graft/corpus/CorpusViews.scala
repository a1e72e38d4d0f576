package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic "web" derived from the driver's TPC-H-ish parquet tables.
  *
  * The sandbox stand-in for the live internet (BASELINE.json `input_hint`) is a
  * `pages(url, warc_ts, html, text, lang, …)` corpus. For the driver's DuckDB
  * correctness gate, every derived view here is defined ONCE as SQL in the
  * portable Spark∩DuckDB dialect subset and executed verbatim by both engines:
  * Spark runs it via `spark.sql` over parquet temp views; the oracle prepends
  * the same text as a CTE. That makes the derivation impossible to drift.
  *
  * Derivation design (all arithmetic on dense orderkeys 0..N-1):
  *  - one page per order; host = hash-bucket `h{key%97}.example.com` → 97 hosts
  *    with realistic key skew;
  *  - page status mixes 200 / 503(retryable) / 301(redirect→key+1) / 404;
  *  - `links` edges from lineitem: src = order page, dst = a mixed key mod N —
  *    a dense, deterministic web graph for BFS/redirect/frontier queries;
  *  - `frontier` rows from lineitem (duplicated urls on purpose — dedup food);
  *  - `robots` rules per host with Disallow prefixes;
  *  - `seen` = the already-crawled state-table snapshot (key%3=0).
  *
  * Scale note: every view is a pure projection/aggregation over the base
  * parquet — narrow, codegen-friendly, filter-pushdown-transparent. At 100 TB
  * the real corpus replaces these views; the engine code only sees DataFrames.
  */
object CorpusViews {

  /** Base tables registered as temp views (per sfDir). */
  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Portable SQL (valid verbatim in Spark SQL and DuckDB 1.0). */
  val viewSql: Seq[(String, String)] = Seq(
    "pages" ->
      """SELECT
        |  'http://h' || CAST(o_orderkey % 97 AS STRING) || '.example.com/p/' || CAST(o_orderkey AS STRING) AS url,
        |  'h' || CAST(o_orderkey % 97 AS STRING) || '.example.com' AS host,
        |  '/p/' || CAST(o_orderkey AS STRING) AS path,
        |  CASE WHEN o_orderkey % 37 = 0 THEN 503
        |       WHEN o_orderkey % 31 = 0 THEN 301
        |       WHEN o_orderkey % 41 = 0 THEN 404
        |       ELSE 200 END AS status,
        |  CASE WHEN o_orderkey % 37 <> 0 AND o_orderkey % 31 = 0 AND o_orderkey % 41 <> 0
        |       THEN 'http://h' || CAST((o_orderkey + 1) % 97 AS STRING) || '.example.com/p/' || CAST(o_orderkey + 1 AS STRING)
        |       ELSE NULL END AS location,
        |  CASE WHEN o_orderkey % 13 = 0 THEN 'text/plain; charset=utf-8'
        |       ELSE 'text/html; charset=utf-8' END AS content_type,
        |  CAST((o_orderkey % 400) * 10 AS BIGINT) AS latency_ms,
        |  o_orderdate AS warc_ts,
        |  CAST('<html><head><title>/p/' || CAST(o_orderkey AS STRING) || '</title></head><body><p class="doc">order ' || o_orderstatus || ' priority ' || o_orderpriority || ' total ' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING) || '</p></body></html>' AS BINARY) AS html,
        |  o_orderkey AS page_key,
        |  'order ' || o_orderstatus || ' priority ' || o_orderpriority || ' total ' || CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING) AS text,
        |  CASE WHEN o_orderkey % 5 = 0 THEN 'tr' ELSE 'en' END AS lang
        |FROM orders""".stripMargin,

    "links" ->
      """SELECT
        |  'http://h' || CAST(l_orderkey % 97 AS STRING) || '.example.com/p/' || CAST(l_orderkey AS STRING) AS src_url,
        |  'http://h' || CAST(((l_orderkey * 31 + l_partkey * 7 + l_linenumber) % n_pages) % 97 AS STRING)
        |    || '.example.com/p/' || CAST((l_orderkey * 31 + l_partkey * 7 + l_linenumber) % n_pages AS STRING) AS dst_url,
        |  'h' || CAST(((l_orderkey * 31 + l_partkey * 7 + l_linenumber) % n_pages) % 97 AS STRING) || '.example.com' AS dst_host,
        |  '/p/' || CAST((l_orderkey * 31 + l_partkey * 7 + l_linenumber) % n_pages AS STRING) AS dst_path,
        |  l_linenumber AS link_pos
        |FROM lineitem CROSS JOIN (SELECT COUNT(*) AS n_pages FROM orders) c""".stripMargin,

    "frontier" ->
      """SELECT
        |  'http://h' || CAST(l_orderkey % 97 AS STRING) || '.example.com/p/' || CAST(l_orderkey AS STRING) AS url,
        |  'h' || CAST(l_orderkey % 97 AS STRING) || '.example.com' AS host,
        |  '/p/' || CAST(l_orderkey AS STRING) AS path,
        |  CAST(l_linenumber % 4 AS INT) AS depth,
        |  CASE WHEN l_orderkey % 11 = 0 THEN 'POST'
        |       WHEN l_orderkey % 17 = 0 THEN 'HEAD'
        |       ELSE 'GET' END AS method,
        |  CAST(l_partkey % 3 AS INT) AS retry,
        |  CAST(l_suppkey % 5 AS INT) AS priority,
        |  l_orderkey * 10 + l_linenumber AS rank
        |FROM lineitem""".stripMargin,

    "robots" ->
      """SELECT
        |  'h' || CAST(hostnum AS STRING) || '.example.com' AS host,
        |  CASE WHEN hostnum % 5 = 0 THEN '/p/1'
        |       WHEN hostnum % 7 = 0 THEN '/p/3'
        |       ELSE NULL END AS disallow_prefix
        |FROM (SELECT DISTINCT o_orderkey % 97 AS hostnum FROM orders) h""".stripMargin,

    "seen" ->
      """SELECT url FROM (
        |  SELECT
        |    'http://h' || CAST(o_orderkey % 97 AS STRING) || '.example.com/p/' || CAST(o_orderkey AS STRING) AS url
        |  FROM orders WHERE o_orderkey % 3 = 0) s""".stripMargin,

    // cached-entry state table for the RFC2616 cache face (cache/cache.go):
    // every even page has a cached copy; max-age spreads 0..288M seconds so
    // a fixed "now" splits fresh vs stale; every 5th entry's validator
    // diverges from the live page (revalidation MISS → refetch).
    "cache" ->
      """SELECT url, page_key,
        |  warc_ts AS cached_at,
        |  CAST(page_key % 97 AS BIGINT) * 3000000 AS max_age_s,
        |  CASE WHEN page_key % 5 = 1
        |       THEN 'W/"prev-' || CAST(page_key AS STRING) || '"'
        |       ELSE 'W/"' || CAST(page_key AS STRING) || '"' END AS etag
        |FROM pages WHERE page_key % 2 = 0""".stripMargin,

    // host-level link graph for authority/priority ranking (q58): the links
    // edge list pre-aggregated to (src_host, dst_host, weight). Weight = link
    // multiplicity. Same dst arithmetic as `links`; grouped here so both
    // engines share the exact aggregation text.
    "host_edges" ->
      """SELECT
        |  'h' || CAST(l_orderkey % 97 AS STRING) || '.example.com' AS src_host,
        |  'h' || CAST(((l_orderkey * 31 + l_partkey * 7 + l_linenumber) % n_pages) % 97 AS STRING) || '.example.com' AS dst_host,
        |  COUNT(*) AS w
        |FROM lineitem CROSS JOIN (SELECT COUNT(*) AS n_pages FROM orders) c
        |GROUP BY 1, 2""".stripMargin,

    "seeds" ->
      """SELECT
        |  'http://h' || CAST(o_orderkey % 97 AS STRING) || '.example.com/p/' || CAST(o_orderkey AS STRING) AS url,
        |  'h' || CAST(o_orderkey % 97 AS STRING) || '.example.com' AS host,
        |  '/p/' || CAST(o_orderkey AS STRING) AS path,
        |  o_orderkey AS rank
        |FROM orders WHERE o_orderkey % 100 < 2""".stripMargin
  )

  private val registered =
    scala.collection.concurrent.TrieMap.empty[(Int, String), Boolean]

  /** Register base parquet tables + derived views as temp views (idempotent
    * per (session, sfDir)). Base reads are plain `spark.read.parquet` so
    * column pruning / predicate pushdown reach the scan.
    */
  def register(spark: SparkSession, sfDir: String): Unit =
    registered.getOrElseUpdate((System.identityHashCode(spark), sfDir), {
      baseTables.foreach { t =>
        val p = s"$sfDir/$t.parquet"
        if (new java.io.File(p).exists())
          spark.read.parquet(p).createOrReplaceTempView(t)
      }
      viewSql.foreach { case (name, sql) =>
        spark.sql(sql).createOrReplaceTempView(name)
      }
      true
    })

  /** A derived view as a DataFrame. */
  def view(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    register(spark, sfDir)
    spark.table(name)
  }

  /** CTE prefix for oracle SQL: `WITH pages AS (...), links AS (...)` — the
    * exact same text Spark executed, so both engines compute identical views.
    */
  def cte(names: String*): String = {
    val m = viewSql.toMap
    names.map(n => s"$n AS (\n${m(n)}\n)").mkString("WITH ", ",\n", "\n")
  }
}
