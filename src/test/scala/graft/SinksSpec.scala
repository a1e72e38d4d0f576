package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import graft.sinks._

/** Golden-byte sink parity with the reference exporter tests
  * (export/csv_test.go:28, export/json_test.go:26,43).
  */
class SinksSpec extends AnyFunSuite {

  private def tmp(name: String): Path =
    Files.createTempDirectory("sinks").resolve(name)

  private def read(p: Path): String =
    new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8)

  test("CSV golden: slice then map record → \"1;2\\nvalue1;value2\\n\" (csv_test.go:28)") {
    val f = tmp("out.csv")
    val csv = Sinks.Csv(comma = ';')
    csv.writeGolden(Seq(
      JArr(Seq(JInt(1), JInt(2))),
      JObj(Seq("key2" -> JStr("value2"), "key1" -> JStr("value1")))),
      f.toString)
    assert(read(f) == "1;2\nvalue1;value2\n")
  }

  test("CSV map values are sorted by rendered value, not key (csv.go:44-48)") {
    val csv = Sinks.Csv()
    // values sort as strings: "10" < "9"
    assert(csv.values(JObj(Seq("a" -> JInt(9), "b" -> JInt(10)))) ==
      Seq("10", "9"))
  }

  test("CSV quoting matches Go csv.Writer") {
    val csv = Sinks.Csv()
    assert(csv.formatRow(JArr(Seq(JStr("a,b"), JStr("c\"d"), JStr("plain")))) ==
      "\"a,b\",\"c\"\"d\",plain\n")
  }

  test("JSON array golden: [\\n\\t{\"key\":\"value\"}\\n]\\n (json_test.go:43)") {
    val f = tmp("out.json")
    Sinks.JsonArray().writeGolden(Seq(JObj(Seq("key" -> JStr("value")))), f.toString)
    assert(read(f) == "[\n\t{\"key\":\"value\"}\n]\n")
  }

  test("JSON array: multiple records comma-separated") {
    val f = tmp("out2.json")
    Sinks.JsonArray().writeGolden(
      Seq(JObj(Seq("a" -> JInt(1))), JObj(Seq("b" -> JInt(2)))), f.toString)
    assert(read(f) == "[\n\t{\"a\":1},\n\t{\"b\":2}\n]\n")
  }

  test("JSONLine indented golden: {\\n \"key\": \"value\"\\n}\\n (json_test.go:26)") {
    val f = tmp("out3.json")
    Sinks.JsonLine(indent = " ")
      .writeGolden(Seq(JObj(Seq("key" -> JStr("value")))), f.toString)
    assert(read(f) == "{\n \"key\": \"value\"\n}\n")
  }

  test("JSONLine compact default: one object per line") {
    val jl = Sinks.JsonLine()
    assert(jl.format(JObj(Seq("k" -> JStr("v"), "a" -> JInt(1)))) ==
      "{\"a\":1,\"k\":\"v\"}\n")
  }

  test("Go map-marshal: keys sorted, EscapeHTML escapes <>& only when on") {
    assert(Json.compact(JObj(Seq("b" -> JStr("<x>&"))), escapeHtml = false) ==
      "{\"b\":\"<x>&\"}")
    assert(Json.compact(JObj(Seq("b" -> JStr("<x>&"))), escapeHtml = true) ==
      "{\"b\":\"\\u003cx\\u003e\\u0026\"}")
  }

  test("string escaping: control chars, quotes, backslash, unicode passthrough") {
    assert(Json.compact(JStr("a\"b\\c\nd\tef“g”")) ==
      "\"a\\\"b\\\\c\\nd\\te\\u0001f“g”\"")
  }

  test("fmt.Sprint rendering for CSV cells") {
    assert(Json.fmtSprint(JArr(Seq(JStr("a"), JStr("b")))) == "[a b]")
    assert(Json.fmtSprint(JInt(42)) == "42")
    assert(Json.fmtSprint(JBool(true)) == "true")
  }

  test("Json.parse round-trips compact encodings") {
    val v = JObj(Seq("n" -> JInt(3), "t" -> JStr("x\n\"y"),
      "a" -> JArr(Seq(JInt(1), JStr("s"), JNull, JBool(false)))))
    assert(Json.parse(Json.compact(v)) match {
      case JObj(fs) => fs.toMap == (v.v.toMap)
      case _ => false
    })
  }
}
