package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.QualityQueries

/** Semantics + plan audits for the round-5 corpus-quality operators
  * (q80–q85). The DuckDB oracle is the value gate; these pin the scale
  * properties the oracle can't see (broadcast joins, window-not-global-sort,
  * quota bounds) and the semantic invariants at a second vantage point.
  */
class QualityQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("q80 incremental dedup: exactly the odd (fresh-content) batch rows " +
    "survive the index anti-join") {
    val out = QualityQueries.qIncrementalDedup.run(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // even doc_ids repeat an indexed text → dropped; odd carry ' v2' → kept
    assert(out.forall(id => (id - 20000) % 2 == 1))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(out.length == nDocs / 2)
  }

  test("q81 gopher rules: keep == conjunction of its per-rule flags, and " +
    "the rule table is row-local (no Exchange in the plan)") {
    val df = QualityQueries.qGopherRules.run(spark, sf)
    val bad = df.filter(col("keep") =!=
      (col("flag_wc") && col("flag_mwl") && col("flag_stop"))).count()
    assert(bad == 0)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q81 must be shuffle-free:\n$plan")
    // the rule table must actually discriminate on this corpus
    val kept = df.filter(col("keep")).count(); val n = df.count()
    assert(kept > 0 && kept < n, s"degenerate rule table: $kept/$n")
  }

  test("q82 lm score: terciles are balanced and ordered (head scores >= " +
    "tail scores); model join is broadcast") {
    val df = QualityQueries.qLmScore.run(spark, sf).cache()
    try {
      val sizes = df.groupBy("bucket").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(sizes.keySet == Set(1, 2, 3))
      assert(sizes.values.max - sizes.values.min <= 1) // NTILE balance
      val minHead = df.filter(col("bucket") === 1)
        .agg(min("score_micro")).head().getLong(0)
      val maxTail = df.filter(col("bucket") === 3)
        .agg(max("score_micro")).head().getLong(0)
      assert(minHead >= maxTail)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"model join must broadcast:\n${plan.take(2000)}")
    } finally df.unpersist()
  }

  test("q83 tfidf terms: <= 3 slots per doc, slot order follows the " +
    "integer score; df side broadcast") {
    val df = QualityQueries.qTfidfTerms.run(spark, sf).cache()
    try {
      val overQuota = df.groupBy("doc_id").count()
        .filter(col("count") > 3).count()
      assert(overQuota == 0)
      // slot 1 score >= slot 2 score within every doc
      val w = df.groupBy("doc_id")
        .agg(max(when(col("slot") === 1, col("score_micro"))).as("s1"),
          max(when(col("slot") === 2, col("score_micro"))).as("s2"))
        .filter(col("s2").isNotNull && col("s1") < col("s2")).count()
      assert(w == 0)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"df join must broadcast:\n${plan.take(2000)}")
    } finally df.unpersist()
  }

  test("q84 host quota: never more than 5 urls per host; no global sort " +
    "(window partitions by host)") {
    val df = QualityQueries.qHostQuota.run(spark, sf).cache()
    try {
      val over = df.groupBy("host").count().filter(col("count") > 5).count()
      assert(over == 0)
      // slots are dense 1..k per host
      val slots = df.groupBy("host")
        .agg(max("slot").as("mx"), count(lit(1)).as("n"))
        .filter(col("mx") =!= col("n")).count()
      assert(slots == 0)
      // a host with >5 candidates really was cut to 5
      val anyFull = df.groupBy("host").count()
        .filter(col("count") === 5).count()
      assert(anyFull > 0, "fixture should have at least one full host")
      val plan = df.queryExecution.executedPlan.toString
      // the only sort allowed is the window's per-partition sort; a global
      // Sort would appear as a range-partitioned Exchange
      assert(!plan.contains("rangepartitioning"),
        s"q84 must not global-sort:\n${plan.take(2000)}")
    } finally df.unpersist()
  }

  test("q86 ivf refine: centroids move toward their members (mean inside " +
    "member range), every cluster-dimension cell present") {
    val df = graft.queries.SimQueries.qIvfRefine.run(spark, sf).cache()
    try {
      // 16 clusters × 64 dims, every assigned cluster fully dimensioned
      val dims = df.groupBy("cluster").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      assert(dims.forall(_._2 == 64), s"ragged dims: ${dims.mkString(",")}")
      // the refined centroid is a member MEAN: |new| can't exceed the
      // quantized component bound (|v|<=1 → |qv|<=1000)
      assert(df.filter(abs(col("new_cv")) > 1000).count() == 0)
      // at least one cluster actually moved (old seed ≠ member mean)
      assert(df.agg(max("move")).head().getLong(0) > 0)
    } finally df.unpersist()
  }

  test("q87 token pack: per-lang cumulative budget respected and greedy " +
    "order is by n_chars desc") {
    val df = QualityQueries.qTokenPack.run(spark, sf).cache()
    try {
      assert(df.filter(col("cum_tokens") > 2000).count() == 0)
      // budget binds: some language kept fewer docs than it has
      val keptPerLang = df.groupBy("lang").count()
      val allPerLang = spark.read.parquet(s"$sf/documents.parquet")
        .groupBy("lang").count().withColumnRenamed("count", "n_all")
      val bound = keptPerLang.join(allPerLang, "lang")
        .filter(col("count") < col("n_all")).count()
      assert(bound > 0, "budget never bound — raise fixture sizes")
    } finally df.unpersist()
  }

  test("q88 change rate: hosts whose pages include page_key%4==0 show " +
    "changes; milli rate consistent with counts") {
    val df = QualityQueries.qChangeRate.run(spark, sf).cache()
    try {
      val bad = df.filter(col("change_milli") =!=
        expr("1000 * n_changed div n_pages")).count()
      assert(bad == 0)
      assert(df.filter(col("n_changed") > 0).count() > 0)
      assert(df.filter(col("n_changed") > col("n_pages")).count() == 0)
    } finally df.unpersist()
  }

  test("q85 url blocklist: first-match-wins by rule priority; rules join " +
    "is a broadcast nested loop (no shuffle for the match)") {
    val df = QualityQueries.qUrlBlocklist.run(spark, sf).cache()
    try {
      // /p/1...7 urls match both rule 1 (path) and rule 3 (suffix) — rule 1
      // must win every time
      val both = df.filter(col("url").contains("/p/1") &&
        col("url").endsWith("7"))
      assert(both.count() > 0)
      assert(both.filter(col("rule_id") =!= 1).count() == 0)
      // urls are unique in the audit (one verdict per url)
      assert(df.count() == df.select("url").distinct().count())
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"rule match must be BNLJ over broadcast rules:\n${plan.take(2000)}")
    } finally df.unpersist()
  }
}
