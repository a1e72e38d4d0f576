package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.corpus.CorpusViews

/** Round-5 training-corpus operators: the production stages a recurring
  * (snapshot-over-snapshot) webtext pipeline runs AFTER the crawl and BEFORE
  * tokenization — incremental dedup against the historical index, the full
  * Gopher-style quality rule table, CCNet-style LM scoring with
  * head/middle/tail buckets, TF-based distinctive-term extraction, per-host
  * crawl-budget quotas, and data-driven URL blocklists.
  *
  * All scoring arithmetic is INTEGER (milli/micro fixed-point via integer
  * division) so Spark and the DuckDB oracle agree bit-for-bit — the same
  * recipe as q44's quantized cosine.
  *
  * Scale notes are per query; the common theme: model/rule tables are tiny
  * relative to the corpus (broadcast), per-doc metrics are row-local
  * (no shuffle), and the only corpus-wide shuffles are the ones the
  * semantics force (digest anti-join, term aggregation).
  */
object QualityQueries {
  import CorpusViews.{view, cte}

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Incremental (cross-snapshot) dedup — the shape a monthly Common-Crawl
    * ingest actually runs: the already-ingested corpus persists only a
    * DIGEST INDEX (one md5 per historical document); each new snapshot
    * batch anti-joins that index and only the survivors are ingested. Here
    * the index is built from `documents` and the new batch is a derived
    * snapshot where even doc_ids repeat an old text (must be dropped) and
    * odd doc_ids carry fresh content (must survive).
    *
    * Scale: the index is digest-bucketed parquet state (like
    * `state/StateStore`); the anti-join shuffles ONLY on the 16-byte
    * digest, never the text. A Bloom filter of the index (graft.state
    * .SeenSet's layered sketch) pre-filters map-side: rows whose digest is
    * definitely-absent skip the shuffle entirely — at a typical 60-80%
    * novel-rate this removes most of the exchange volume.
    */
  val qIncrementalDedup = Q(
    "q80_incremental_dedup",
    (s, dir) => {
      val d = docs(s, dir)
      val index = d.select(md5(col("text")).as("digest")).distinct()
      val batch = d.select(
        (col("doc_id") + 20000).as("doc_id"),
        when(col("doc_id") % 2 === 1, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      batch.select(col("doc_id"), md5(col("text")).as("digest"))
        .join(index, Seq("digest"), "left_anti")
        .select(col("doc_id"), col("digest"))
    },
    Some("""WITH idx AS (SELECT DISTINCT md5(text) AS digest FROM documents),
        |batch AS (
        |  SELECT doc_id + 20000 AS doc_id,
        |    CASE WHEN doc_id % 2 = 1 THEN text || ' v2' ELSE text END AS text
        |  FROM documents
        |)
        |SELECT b.doc_id AS doc_id, md5(b.text) AS digest
        |FROM batch b
        |WHERE md5(b.text) NOT IN (SELECT digest FROM idx)""".stripMargin))

  /** Gopher-style quality RULE TABLE (Rae et al. 2021 §A1.1 shape): per-doc
    * row-local metrics → one boolean per rule → a keep verdict. q23 scores;
    * this emits the full auditable rule breakdown a corpus card reports.
    * Metrics here complement q63's repetition family: word-count bounds,
    * mean word length (milli), stopword fraction (milli).
    *
    * Scale: pure row-local projection — NO shuffle, whole-stage codegen,
    * runs at scan speed on 100 TB. This is why Gopher rules are the first
    * filter stage in every production pipeline: they cost one pass.
    */
  val qGopherRules = Q(
    "q81_gopher_rules",
    (s, dir) => {
      val nWords = expr("CAST(size(split(trim(text), ' ')) AS BIGINT)")
      val charNoSpace = expr("CAST(length(replace(text, ' ', '')) AS BIGINT)")
      val padded = "' ' || text || ' '"
      def hits(w: String) = s"CAST((length($padded) - " +
        s"length(replace($padded, ' $w ', ''))) div ${w.length + 2} AS BIGINT)"
      val stopHits = expr(
        Seq("the", "a", "of", "and").map(hits).mkString(" + "))
      docs(s, dir)
        .select(col("doc_id"), nWords.as("n_words"),
          charNoSpace.as("n_wordchars"), stopHits.as("stop_hits"))
        .select(col("doc_id"), col("n_words"),
          expr("1000 * n_wordchars div n_words").as("mean_word_len_milli"),
          expr("1000 * stop_hits div n_words").as("stop_frac_milli"))
        .select(col("doc_id"), col("n_words"), col("mean_word_len_milli"),
          col("stop_frac_milli"),
          col("n_words").between(20, 90).as("flag_wc"),
          col("mean_word_len_milli").between(3000, 10000).as("flag_mwl"),
          (col("stop_frac_milli") >= 20).as("flag_stop"))
        .withColumn("keep",
          col("flag_wc") && col("flag_mwl") && col("flag_stop"))
    },
    Some("""WITH m AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_wordchars,
        |    CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' the ', ''))) // 5
        |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' a ', ''))) // 3
        |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' of ', ''))) // 4
        |      + (length(' ' || text || ' ') - length(replace(' ' || text || ' ', ' and ', ''))) // 5
        |      AS BIGINT) AS stop_hits
        |  FROM documents
        |), r AS (
        |  SELECT doc_id, n_words,
        |    1000 * n_wordchars // n_words AS mean_word_len_milli,
        |    1000 * stop_hits // n_words AS stop_frac_milli
        |  FROM m
        |)
        |SELECT doc_id, n_words, mean_word_len_milli, stop_frac_milli,
        |  n_words BETWEEN 20 AND 90 AS flag_wc,
        |  mean_word_len_milli BETWEEN 3000 AND 10000 AS flag_mwl,
        |  stop_frac_milli >= 20 AS flag_stop,
        |  (n_words BETWEEN 20 AND 90) AND (mean_word_len_milli BETWEEN 3000 AND 10000)
        |    AND stop_frac_milli >= 20 AS keep
        |FROM r""".stripMargin))

  /** CCNet-style LM quality scoring (Wenzek et al. 2020): train a WORD-
    * BIGRAM model on the corpus itself (count(w1,w2) / count(w1·)), score
    * each document by its mean per-bigram probability, and split the corpus
    * into head/middle/tail terciles. Probabilities are integer micro-units
    * ((1e6·c12) div c1) so both engines rank identically; the tercile is
    * NTILE(3) over the deterministic (score desc, doc_id) total order.
    *
    * Scale: the model is vocab² rows — megabytes against a 100 TB corpus —
    * so the score join BROADCASTS the model; doc scoring re-aggregates on
    * doc_id (the explode's original partitioning, map-side combinable). The
    * global NTILE here is the small-face stand-in: at corpus scale the
    * terciles come from approx quantiles of the score (two scan passes),
    * never a global sort.
    */
  val qLmScore = Q(
    "q82_lm_score",
    (s, dir) => {
      val words = docs(s, dir)
        .select(col("doc_id"), split(trim(col("text")), " ").as("w"))
      val bg = words.select(col("doc_id"),
        explode(expr(
          """CASE WHEN size(w) >= 2
            |  THEN transform(sequence(0, size(w)-2),
            |                 i -> struct(w[i] AS w1, w[i+1] AS w2))
            |  ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>)
            |END""".stripMargin)).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c12"))
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val model = c12.join(c1, Seq("w1"))
        .select(col("w1"), col("w2"),
          expr("1000000 * c12 div c1").as("p_micro"))
      val scored = bg.join(broadcast(model), Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("sp"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sp div n_bigrams").as("score_micro"))
      scored.withColumn("bucket",
        ntile(3).over(Window.orderBy(col("score_micro").desc, col("doc_id"))))
    },
    Some("""WITH words AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS w FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1,
        |    unnest(list_transform(range(1, len(w)), i -> w[i + 1])) AS w2
        |  FROM words
        |), c12 AS (
        |  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1
        |), model AS (
        |  SELECT c12.w1, c12.w2, 1000000 * c12.c12 // c1.c1 AS p_micro
        |  FROM c12 JOIN c1 USING (w1)
        |), scored AS (
        |  SELECT b.doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(m.p_micro) // COUNT(*) AS BIGINT) AS score_micro
        |  FROM bg b JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
        |  GROUP BY b.doc_id
        |)
        |SELECT doc_id, n_bigrams, score_micro,
        |  NTILE(3) OVER (ORDER BY score_micro DESC, doc_id) AS bucket
        |FROM scored""".stripMargin))

  /** Distinctive-term extraction: top-3 terms per document by an integer
    * tf·inv-df surrogate ((1e6·tf) div df) — the keyword step of corpus
    * exploration / topic binning. Deterministic rank order
    * (score desc, term asc).
    *
    * Scale: term stats aggregate on (doc_id, term) — the explode's natural
    * key, partial-agg combinable; the df side is vocab-sized (broadcast
    * back); the final top-k window partitions BY DOC, so no global sort
    * and no skew (each doc's term list is document-length-bounded).
    */
  val qTfidfTerms = Q(
    "q83_tfidf_terms",
    (s, dir) => {
      val w = docs(s, dir).select(col("doc_id"),
        explode(split(trim(col("text")), " ")).as("term"))
      val tf = w.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val df = w.groupBy(col("term"))
        .agg(countDistinct(col("doc_id")).as("df"))
      val scored = tf.join(broadcast(df), Seq("term"))
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          expr("1000000 * tf div df").as("score_micro"))
      scored.withColumn("slot",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score_micro").desc, col("term"))))
        .filter(col("slot") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("score_micro"), col("slot"))
    },
    Some("""WITH w AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2
        |), df AS (
        |  SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY 1
        |), scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    1000000 * tf.tf // df.df AS score_micro
        |  FROM tf JOIN df USING (term)
        |)
        |SELECT doc_id, term, tf, df, score_micro, slot FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
        |    ORDER BY score_micro DESC, term) AS slot
        |  FROM scored) t
        |WHERE slot <= 3""".stripMargin))

  /** Per-host crawl-budget quota — frontier admission control: each host
    * gets B=5 slots per scheduling round, filled by (priority desc, rank
    * asc) — the budget allocation step between the frontier and the
    * politeness gate (Heritrix "queue budget", the reference's single-host
    * analog is the per-host concurrency cap).
    *
    * Scale: ONE host-keyed shuffle; each host's candidate list sorts
    * locally inside its partition (window, not global sort); AQE splits
    * skewed mega-hosts. The overflow (slot > B) stays queued for the next
    * round — at 10^8 hosts this bounds per-round frontier size by 5·hosts
    * regardless of how deep any single host's queue is.
    */
  val qHostQuota = Q(
    "q84_host_quota",
    (s, dir) => {
      val cand = view(s, dir, "frontier")
        .groupBy(col("url"), col("host"))
        .agg(max(col("priority")).as("priority"), min(col("rank")).as("rank"))
      cand.withColumn("slot",
        row_number().over(Window.partitionBy(col("host"))
          .orderBy(col("priority").desc, col("rank"), col("url"))))
        .filter(col("slot") <= 5)
        .select(col("host"), col("url"), col("priority"), col("slot"))
    },
    Some(cte("frontier") +
      """SELECT host, url, priority, slot FROM (
        |  SELECT host, url, priority,
        |    ROW_NUMBER() OVER (PARTITION BY host
        |      ORDER BY priority DESC, rank, url) AS slot
        |  FROM (
        |    SELECT url, host, MAX(priority) AS priority, MIN(rank) AS rank
        |    FROM frontier GROUP BY url, host) c
        |) q WHERE slot <= 5""".stripMargin))

  /** Data-driven URL blocklist — rules ship as a TABLE (pattern + priority
    * + name), not code: the production shape for adult/spam/boilerplate
    * URL filters that rotate without redeploying the engine. First match
    * by rule priority wins; output is the block audit (url → rule).
    *
    * Scale: the rule table is broadcast (thousands of rules vs 10^10
    * URLs); the LIKE-join is a broadcast nested loop that stays inside the
    * scan stage — no shuffle for the match itself, one url-keyed window
    * for first-match-wins (or a groupBy min(struct) to stay partial-agg).
    */
  val qUrlBlocklist = Q(
    "q85_url_blocklist",
    (s, dir) => {
      import s.implicits._
      val rules = Seq(
        (1, "%/p/1%", "path_p1"),
        (2, "%h7.example.com%", "host_h7"),
        (3, "%7", "suffix_7")).toDF("rule_id", "pattern", "rule_name")
      val matched = view(s, dir, "pages").select(col("url"))
        .join(broadcast(rules), expr("url LIKE pattern"))
      matched.groupBy(col("url"))
        .agg(min(struct(col("rule_id"), col("rule_name"))).as("m"))
        .select(col("url"), col("m.rule_id").as("rule_id"),
          col("m.rule_name").as("rule_name"))
    },
    Some(cte("pages") +
      """SELECT url, rule_id, rule_name FROM (
        |  SELECT p.url, r.rule_id, r.rule_name,
        |    ROW_NUMBER() OVER (PARTITION BY p.url ORDER BY r.rule_id) AS rn
        |  FROM pages p JOIN (
        |    VALUES (1, '%/p/1%', 'path_p1'),
        |           (2, '%h7.example.com%', 'host_h7'),
        |           (3, '%7', 'suffix_7')) r(rule_id, pattern, rule_name)
        |    ON p.url LIKE r.pattern
        |) m WHERE rn = 1""".stripMargin))

  /** Token-budget corpus packing — the final corpus-build step: each
    * language stratum is filled GREEDILY by quality order (longest docs
    * first here; in production the q82 LM tercile / q81 verdict feeds the
    * order) until the stratum's token budget (2,000) is hit. Running
    * totals via a cumulative window; a doc is kept iff its own cumulative
    * total still fits.
    *
    * Scale: the window partitions by language, which is SKEWED at corpus
    * scale (40% of the web is English) — so the 100 TB plan first takes
    * per-shard sub-quotas (budget/shards per partition, map-side) and then
    * one tiny trim pass over shard boundaries; the per-lang window here is
    * the semantics face of that two-phase sum. Documented, like q40's
    * brute-force face next to q43's banded path.
    */
  val qTokenPack = Q(
    "q87_token_pack",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"), col("lang"),
        expr("CAST(size(split(trim(text), ' ')) AS BIGINT)").as("n_tokens"),
        col("n_chars"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").desc, col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      d.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= 2000)
        .select(col("doc_id"), col("lang"), col("n_tokens"),
          col("cum_tokens"))
    },
    Some("""WITH d AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |    n_chars
        |  FROM documents
        |)
        |SELECT doc_id, lang, n_tokens, cum_tokens FROM (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY n_chars DESC, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
        |  FROM d) t
        |WHERE cum_tokens <= 2000""".stripMargin))

  /** Cross-snapshot content change rate per host — the input the q74
    * revisit scheduler consumes: re-fetch two snapshots of the same URL
    * set, compare content DIGESTS (never the bodies), aggregate the
    * changed fraction per host in integer milli units. Snapshot B is the
    * derived re-crawl where every 4th page changed.
    *
    * Scale: digests computed in the scan projection (16 bytes per page
    * leaves the exchange, not the body); equi-join on url; ONE host-keyed
    * partial agg. Change rates then broadcast back into the scheduler as
    * a host-level dimension table.
    */
  val qChangeRate = Q(
    "q88_change_rate",
    (s, dir) => {
      val a = view(s, dir, "pages")
        .select(col("url"), col("host"), col("page_key"),
          md5(col("text")).as("da"))
      val b = view(s, dir, "pages")
        .select(col("url"),
          md5(when(col("page_key") % 4 === 0,
            concat(col("text"), lit(" changed")))
            .otherwise(col("text"))).as("db"))
      a.join(b, Seq("url"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_pages"),
          sum(when(col("da") =!= col("db"), 1L).otherwise(0L))
            .as("n_changed"))
        .select(col("host"), col("n_pages"), col("n_changed"),
          expr("1000 * n_changed div n_pages").as("change_milli"))
    },
    Some(cte("pages") +
      """SELECT host, n_pages, n_changed,
        |  CAST(1000 * n_changed // n_pages AS BIGINT) AS change_milli
        |FROM (
        |  SELECT a.host, COUNT(*) AS n_pages,
        |    CAST(SUM(CASE WHEN md5(a.text) <>
        |      md5(CASE WHEN b.page_key % 4 = 0 THEN b.text || ' changed'
        |               ELSE b.text END) THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
        |  FROM pages a JOIN pages b ON a.url = b.url
        |  GROUP BY a.host) t""".stripMargin))

  val all: Seq[Q] = Seq(qIncrementalDedup, qGopherRules, qLmScore,
    qTfidfTerms, qHostQuota, qUrlBlocklist, qTokenPack, qChangeRate)
}
