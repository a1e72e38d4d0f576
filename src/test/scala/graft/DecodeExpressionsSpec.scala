package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.DecodeExpressions.{decode_body, is_html}
import graft.pipeline.CharsetDecode

/** The codegen'd decode/IsHTML expressions must agree with the pipeline's
  * CharsetDecode on the full resolution ladder (BOM > Content-Type charset
  * > meta charset > windows-1252) and stay inside whole-stage codegen.
  */
class DecodeExpressionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val matrix: Seq[(Array[Byte], String)] = Seq(
    // plain ascii + explicit utf-8 charset param
    ("<html><p>plain</p></html>".getBytes("UTF-8"),
      "text/html; charset=utf-8"),
    // utf-8 BOM overrides a lying Content-Type
    (Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      "bommed ü".getBytes("UTF-8"), "text/html; charset=iso-8859-1"),
    // utf-16le BOM
    (Array[Byte](0xff.toByte, 0xfe.toByte) ++
      "wide".getBytes("UTF-16LE"), "text/html"),
    // charset only in a meta tag
    ("<html><head><meta charset=\"iso-8859-9\"></head><body>ş</body></html>"
      .getBytes("ISO-8859-9"), "text/html"),
    // ISO-8859-9 via Content-Type param (the reference's client_test case)
    ("türkçe".getBytes("ISO-8859-9"),
      "text/html; charset=iso-8859-9"),
    // no Content-Type at all → windows-1252 ladder fallback
    (Array[Byte](0x93.toByte, 0x68, 0x69, 0x94.toByte), null),
    ("<p>x</p>".getBytes("UTF-8"), "application/xhtml+xml"),
    ("not html".getBytes("UTF-8"), "text/plain; charset=utf-8"))

  test("decode_body/is_html agree with CharsetDecode across the ladder") {
    val df = matrix.toDF("body", "ct")
      .select(decode_body(col("body"), col("ct")).as("d"),
        is_html(col("ct")).as("h"))
    val got = df.collect().map(r => (r.getString(0), r.getBoolean(1)))
    val want = matrix.map { case (b, ct) =>
      (CharsetDecode.decode(b, ct), CharsetDecode.isHtml(ct)) }
    assert(got.toSeq == want)
    // reference null semantics: null body → null decode; null ct → false,
    // never null
    val nulls = Seq((null: Array[Byte], null: String)).toDF("body", "ct")
      .select(decode_body(col("body"), col("ct")), is_html(col("ct")))
      .collect().head
    assert(nulls.isNullAt(0) && !nulls.getBoolean(1))
  }

  test("whole-stage codegen span covers the decode (no UDF break)") {
    // spark.range input: literal DataFrames constant-fold to
    // LocalTableScan and never exercise doGenCode (repo gotcha)
    val df = spark.range(0, 64, 1, 2)
      .select(encode(concat(lit("<p>row "), col("id"), lit("</p>")), "UTF-8")
        .as("body"), lit("text/html; charset=utf-8").as("ct"))
      .select(decode_body(col("body"), col("ct")).as("d"),
        is_html(col("ct")).as("h"))
    assert(df.filter(col("h")).count() == 64)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*("), s"no codegen span in:\n$plan")
  }
}
