package graft.sinks

import org.apache.spark.sql.DataFrame
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Record exporters with the reference's exact byte formats.
  *
  * Two modes per sink:
  *  - `write(df, dir)` — distributed Spark-native output (the 100 TB path:
  *    records are already serialized JSON strings, `df.write.text` streams
  *    them without a driver bottleneck; exporter fan-out = persist the batch
  *    once, write N times — geziyor.go:326-364 semantics).
  *  - `writeGolden(records, file)` — single-file driver-side writer used by
  *    the golden-byte parity tests (export/json_test.go, export/csv_test.go).
  */
object Sinks {

  /** JSONLine (export/json.go:12-40): one JSON document per record,
    * json.Encoder semantics (compact + '\n', EscapeHTML=false default,
    * optional SetIndent).
    */
  final case class JsonLine(
      escapeHtml: Boolean = false,
      prefix: String = "",
      indent: String = "") {

    def format(rec: JsonValue): String =
      if (prefix.isEmpty && indent.isEmpty)
        Json.compact(rec, escapeHtml) + "\n"
      else
        Json.indented(rec, prefix, indent, escapeHtml) + "\n"

    def writeGolden(records: Seq[JsonValue], file: String): Unit =
      append(file, records.map(format).mkString)

    /** Distributed: `json` column already holds compact-encoded records. */
    def write(df: DataFrame, dir: String): Unit =
      df.select("json").write.mode("append").text(dir)
  }

  /** JSON array (export/json.go:44-97): golden bytes per the reference's own
    * exporter test (export/json_test.go:43): `[\n` + `\t{compact}` records
    * + `]\n`, records separated by `,\n`.
    */
  final case class JsonArray(escapeHtml: Boolean = false) {
    def writeGolden(records: Seq[JsonValue], file: String): Unit = {
      val body = records
        .map(r => "\t" + Json.compact(r, escapeHtml))
        .mkString(",\n")
      append(file, "[\n" + body + (if (records.nonEmpty) "\n" else "") + "]\n")
    }
  }

  /** CSV (export/csv.go:20-57): slice records keep order; map records render
    * every value through fmt.Sprint then sort the VALUES (csv.go:44-48 — the
    * reference's odd-but-load-bearing semantic, golden csv_test.go:28
    * `"1;2\nvalue1;value2\n"`). Go csv.Writer quoting: quote fields containing
    * the comma, quote, CR/LF, or leading space.
    */
  final case class Csv(comma: Char = ',', useCrlf: Boolean = false) {

    def values(rec: JsonValue): Seq[String] = rec match {
      case JArr(a) => a.map(Json.fmtSprint)
      case JObj(f) => f.map { case (_, v) => Json.fmtSprint(v) }.sorted
      case other => Seq(Json.fmtSprint(other))
    }

    private def quoteField(f: String): String = {
      val needs = f.contains(comma) || f.contains('"') || f.contains('\n') ||
        f.contains('\r') || f.startsWith(" ")
      if (needs) "\"" + f.replace("\"", "\"\"") + "\"" else f
    }

    def formatRow(rec: JsonValue): String =
      values(rec).map(quoteField).mkString(comma.toString) +
        (if (useCrlf) "\r\n" else "\n")

    def writeGolden(records: Seq[JsonValue], file: String): Unit =
      append(file, records.map(formatRow).mkString)

    /** Distributed: format rows executor-side, stream as text. */
    def write(df: DataFrame, dir: String): Unit = {
      val c = this
      import org.apache.spark.sql.functions.{col, udf}
      val fmt = udf((json: String) => c.formatRow(Json.parse(json)).stripSuffix("\n"))
      df.select(fmt(col("json")).as("row")).write.mode("append").text(dir)
    }
  }

  /** PrettyPrint (export/pprint.go:12-21): MarshalIndent to stdout. */
  final case class PrettyPrint() {
    def format(rec: JsonValue): String = Json.indented(rec, "", "  ") + "\n"
  }

  private def append(file: String, s: String): Unit = {
    val p = Paths.get(file)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.write(p, s.getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }
}
