package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, HashOps}
import org.apache.spark.unsafe.types.UTF8String

class HashExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def naivePoly(s: String): Long =
    s.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)

  private def naiveMinGram(s: String, n: Int): Long =
    if (s.length < n) naivePoly(s)
    else (0 to s.length - n).map(i => naivePoly(s.substring(i, i + n))).min

  test("polyHash matches the naive fold") {
    Seq("", "a", "abc", "the quick brown fox", "ünïcödé").foreach { s =>
      assert(HashOps.polyHash(UTF8String.fromString(s)) == naivePoly(s), s)
    }
  }

  test("rollingMinHash O(len) equals naive O(len·n) on random strings") {
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(60)).mkString
      val n = 1 + rnd.nextInt(8)
      assert(HashOps.rollingMinHash(UTF8String.fromString(s), n) ==
        naiveMinGram(s, n), s"s=$s n=$n")
    }
  }

  test("rollingMinHash windows over CODEPOINTS (supplementary plane safe)") {
    // 𝄞 (U+1D11E) is two UTF-16 units but ONE codepoint — the window must
    // slide over codepoints to agree with polyHash and the DuckDB oracle
    val s = "ab𝄞cd𝄞ef"
    val cps = s.codePoints.toArray
    def polyCp(a: Array[Int]): Long =
      a.foldLeft(0L)((h, c) => (h * 31 + c) % 1000000007L)
    (1 to 5).foreach { n =>
      val naive = (0 to cps.length - n).map(i => polyCp(cps.slice(i, i + n))).min
      assert(HashOps.rollingMinHash(UTF8String.fromString(s), n) == naive,
        s"n=$n")
    }
  }

  test("expressions evaluate inside a DataFrame plan with whole-stage codegen") {
    // spark.range input defeats constant folding, so the projection must
    // really run through generated code
    val df = spark.range(3)
      .select(concat(lit("doc "), col("id").cast("string")).as("t"))
      .select(col("t"), HashExpressions.poly_hash(col("t")).as("ph"),
        HashExpressions.rolling_min_hash(col("t"), 4).as("rmh"))
    val rows = df.collect().sortBy(_.getString(0))
    rows.foreach { r =>
      assert(r.getLong(1) == naivePoly(r.getString(0)))
      assert(r.getLong(2) == naiveMinGram(r.getString(0), 4))
    }
    // the whole projection stays inside WholeStageCodegen — Spark renders
    // codegen'd operators with a "*(stageId)" prefix; a fallback would
    // print the Project bare
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("poly_hash"), plan)
  }

  test("SQL registration: poly_hash / rolling_min_hash usable from spark.sql") {
    import spark.implicits._
    HashExpressions.register(spark)
    Seq("abc").toDF("t").createOrReplaceTempView("hash_t")
    val r = spark.sql(
      "SELECT poly_hash(t) AS a, rolling_min_hash(t, 2) AS b FROM hash_t")
      .collect().head
    assert(r.getLong(0) == naivePoly("abc"))
    assert(r.getLong(1) == naiveMinGram("abc", 2))
  }
}
