package graft.sinks

/** Minimal JSON value AST + Go-`encoding/json`-compatible serialization.
  *
  * Parsers emit records as JsonValue; sinks format them with the exact byte
  * conventions of the reference exporters (export/json.go:12-97):
  *  - object keys sorted (Go marshals map keys in sorted order)
  *  - EscapeHTML=false by default (JSONLine/JSON zero-value structs)
  *  - strings escape `"` `\` `\n` `\r` `\t` and other control chars as \u00XX
  *  - SetIndent-style indented encoding for JSONLine{Indent:" "} parity
  */
sealed trait JsonValue
final case class JStr(v: String) extends JsonValue
final case class JInt(v: Long) extends JsonValue
final case class JDouble(v: Double) extends JsonValue
final case class JBool(v: Boolean) extends JsonValue
case object JNull extends JsonValue
final case class JArr(v: Seq[JsonValue]) extends JsonValue
/** Fields are sorted by key at render time (Go map marshal semantics). */
final case class JObj(v: Seq[(String, JsonValue)]) extends JsonValue

object Json {

  def escape(s: String, escapeHtml: Boolean): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c if escapeHtml && (c == '<' || c == '>' || c == '&') =>
        sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def num(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  /** Compact encoding (json.Marshal). */
  def compact(v: JsonValue, escapeHtml: Boolean = false): String = v match {
    case JStr(s) => "\"" + escape(s, escapeHtml) + "\""
    case JInt(i) => i.toString
    case JDouble(d) => num(d)
    case JBool(b) => b.toString
    case JNull => "null"
    case JArr(a) => a.map(compact(_, escapeHtml)).mkString("[", ",", "]")
    case JObj(f) => f.sortBy(_._1)
      .map { case (k, x) => "\"" + escape(k, escapeHtml) + "\":" + compact(x, escapeHtml) }
      .mkString("{", ",", "}")
  }

  /** Indented encoding matching Go json.Encoder.SetIndent(prefix, indent)
    * (JSONLine{Indent:" "} golden: `{\n "key": "value"\n}`).
    */
  def indented(v: JsonValue, prefix: String, indent: String,
      escapeHtml: Boolean = false): String = {
    def rec(x: JsonValue, depth: Int): String = {
      val pad = prefix + indent * (depth + 1)
      val close = prefix + indent * depth
      x match {
        case JArr(a) if a.nonEmpty =>
          a.map(e => pad + rec(e, depth + 1)).mkString("[\n", ",\n", s"\n$close]")
        case JArr(_) => "[]"
        case JObj(f) if f.nonEmpty =>
          f.sortBy(_._1).map { case (k, e) =>
            pad + "\"" + escape(k, escapeHtml) + "\": " + rec(e, depth + 1)
          }.mkString("{\n", ",\n", s"\n$close}")
        case JObj(_) => "{}"
        case other => compact(other, escapeHtml)
      }
    }
    rec(v, 0)
  }

  /** Go `fmt.Sprint` rendering (the CSV exporter renders every value through
    * fmt.Sprint before the value-sort, export/csv.go:40-48).
    */
  def fmtSprint(v: JsonValue): String = v match {
    case JStr(s) => s
    case JInt(i) => i.toString
    case JDouble(d) => num(d)
    case JBool(b) => b.toString
    case JNull => "<nil>"
    case JArr(a) => a.map(fmtSprint).mkString("[", " ", "]")
    case JObj(f) => f.sortBy(_._1)
      .map { case (k, x) => s"$k:${fmtSprint(x)}" }.mkString("map[", " ", "]")
  }

  /** Minimal JSON parser (for sinks re-reading record strings; records are
    * engine-generated so input is always well-formed).
    */
  def parse(s: String): JsonValue = new P(s).value()

  private final class P(s: String) {
    private var i = 0
    private def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def value(): JsonValue = {
      ws()
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val fs = Seq.newBuilder[(String, JsonValue)]
          if (s.charAt(i) == '}') { i += 1; return JObj(Nil) }
          while ({
            ws(); val k = str(); ws(); require(s.charAt(i) == ':'); i += 1
            fs += k -> value(); ws()
            if (s.charAt(i) == ',') { i += 1; true }
            else { require(s.charAt(i) == '}'); i += 1; false }
          }) ()
          JObj(fs.result())
        case '[' =>
          i += 1; ws()
          val es = Seq.newBuilder[JsonValue]
          if (s.charAt(i) == ']') { i += 1; return JArr(Nil) }
          while ({
            es += value(); ws()
            if (s.charAt(i) == ',') { i += 1; true }
            else { require(s.charAt(i) == ']'); i += 1; false }
          }) ()
          JArr(es.result())
        case '"' => JStr(str())
        case 't' => i += 4; JBool(true)
        case 'f' => i += 5; JBool(false)
        case 'n' => i += 4; JNull
        case _ =>
          val st = i
          while (i < s.length && "+-.eE0123456789".indexOf(s.charAt(i)) >= 0) i += 1
          val t = s.substring(st, i)
          if (t.exists(c => c == '.' || c == 'e' || c == 'E')) JDouble(t.toDouble)
          else JInt(t.toLong)
      }
    }
    private def str(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case c => sb.append(c); i += 1
          }
        } else { sb.append(s.charAt(i)); i += 1 }
      }
      i += 1
      sb.toString
    }
  }
}
