package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{TextExpressions, TextOps}
import org.apache.spark.unsafe.types.UTF8String

class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def jdkNfc(s: String): String =
    java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  test("TextOps.nfc composes decomposed sequences and round-trips NFC text") {
    // e + COMBINING ACUTE → é; A + COMBINING RING → Å; ASCII unchanged
    val dec = "café naïve Ångström"
    val out = TextOps.nfc(UTF8String.fromString(dec)).toString
    assert(out == "café naïve Ångström")
    assert(out == jdkNfc(dec))
    // already-NFC input returns the SAME UTF8String instance (no realloc)
    val nfc = UTF8String.fromString("café plain ascii")
    assert(TextOps.nfc(nfc) eq nfc)
  }

  test("byte lengths shrink under composition (the q90 oracle invariant)") {
    val dec = "é"                       // 1 + 2 bytes
    val out = TextOps.nfc(UTF8String.fromString(dec))
    assert(UTF8String.fromString(dec).numBytes == 3)
    assert(out.numBytes == 2)                  // é = 2 bytes
  }

  test("expression runs inside whole-stage codegen and handles nulls") {
    val df = spark.range(4)
      .select(when(col("id") === 3, lit(null).cast("string"))
        .otherwise(concat(lit("v"), col("id").cast("string"),
          lit(" café"))).as("t"))
      .select(col("t"), TextExpressions.nfc_normalize(col("t")).as("n"))
    val rows = df.collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getString(1) == jdkNfc(r.getString(0)))
    }
    assert(rows.count(_.isNullAt(1)) == 1)
    // codegen'd operators render with a "*(stageId)" prefix; a codegen
    // fallback would print the Project bare
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("nfc_normalize"),
      s"nfc_normalize fell out of codegen:\n$plan")
  }

  test("SQL registration: nfc_normalize callable from spark.sql") {
    TextExpressions.register(spark)
    val out = spark.sql("SELECT nfc_normalize('café') AS n")
      .collect().head.getString(0)
    assert(out == "café")
  }

  test("TextOps.idnAscii: RFC 3490 known answers, lowercase fold, " +
    "fast-path identity for lowercase ASCII") {
    def idn(s: String) = TextOps.idnAscii(UTF8String.fromString(s)).toString
    // the q101 oracle's pinned A-labels
    assert(idn("bücher.example.com") == "xn--bcher-kva.example.com")
    assert(idn("пример.example.com") == "xn--e1afmkfd.example.com")
    assert(idn("héllo-wörld.example.com") ==
      "xn--hllo-wrld-b4a2m.example.com")
    // all-ASCII mixed case canonicalizes by lowering only
    assert(idn("MiXeD-Case.Example.COM") == "mixed-case.example.com")
    // already-canonical host returns the SAME instance (no realloc)
    val plain = UTF8String.fromString("plain.example.com")
    assert(TextOps.idnAscii(plain) eq plain)
    // round-trip: an A-label input is already ASCII-lowercase → unchanged
    val alabel = UTF8String.fromString("xn--bcher-kva.example.com")
    assert(TextOps.idnAscii(alabel) eq alabel)
    // malformed hosts (empty label; >63-octet A-label) must NOT throw —
    // one garbage href row can't be allowed to kill a 10^10-row stage;
    // pass-through keeps the raw spelling, same as the ASCII fast path
    assert(idn("ü..example.com") == "ü..example.com")
    val longLabel = "ü" + ("a" * 70)
    assert(idn(s"$longLabel.example.com") == s"$longLabel.example.com")
  }

  test("idn_ascii expression stays in whole-stage codegen, handles nulls, " +
    "registers for SQL") {
    val df = spark.range(4)
      .select(when(col("id") === 3, lit(null).cast("string"))
        .otherwise(when(col("id") === 0, lit("bücher.example.com"))
          .otherwise(lit("plain.example.com"))).as("h"))
      .select(col("h"), TextExpressions.idn_ascii(col("h")).as("a"))
    val rows = df.collect()
    assert(rows.count(_.isNullAt(1)) == 1)
    assert(rows.exists(r => !r.isNullAt(1) &&
      r.getString(1) == "xn--bcher-kva.example.com"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("idn_ascii"),
      s"idn_ascii fell out of codegen:\n$plan")
    TextExpressions.register(spark)
    assert(spark.sql("SELECT idn_ascii('ПРИМЕР.example.com') AS a")
      .collect().head.getString(0) == "xn--e1afmkfd.example.com")
  }
}
