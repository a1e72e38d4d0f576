package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text-canonicalization primitives as native Catalyst expressions
  * (SURVEY.md §4 extension path: codegen'd `Expression` > UDF). A webtext
  * corpus mixes NFC and NFD sources (Mac-originated uploads, legacy CMSes,
  * copy-paste chains), so exact/MinHash dedup and token counting see
  * `café` ≠ `cafe´` unless ingestion canonicalizes — every production
  * pipeline normalizes before fingerprinting (e.g. ftfy/NFC in CCNet,
  * Dolma's unicode fixes).
  *
  * Static eval helper on the companion so generated code calls one
  * JVM-static method (the same shape as Spark's own string expressions and
  * graft's HashOps).
  */
object TextOps {
  /** Canonical-composition normalization (Unicode NFC). `java.text
    * .Normalizer` is ICU-equivalent for the canonical forms and ships with
    * the JDK — no dependency. Fast path: `Normalizer.isNormalized` is a
    * cheap scan that avoids allocating for the (dominant) already-NFC case.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** IDN host canonicalization to lowercase A-label (punycode) form via the
    * JDK's RFC 3490 ToASCII (`java.net.IDN`) — the same transform every
    * crawler applies before a host becomes a frontier / politeness /
    * robots key (an internationalized domain reaches the crawler both as
    * U-labels from href text and as A-labels from the wire; without this
    * the two spellings of one host split its politeness budget and dedup
    * scope). Fast path: an already-lowercase pure-ASCII host (the dominant
    * case by far on webtext) returns unchanged with no allocation.
    *
    * Malformed hosts (empty labels like `a..b`, labels whose A-label form
    * exceeds 63 octets) make `IDN.toASCII` throw — and href-derived hosts
    * on real webtext contain plenty of both. A throwing row must never
    * kill a 10^10-row stage, and garbage pure-ASCII hosts already pass
    * through the fast path untouched, so the consistent total behavior is
    * pass-through: unconvertible input keeps its raw spelling as the key.
    */
  def idnAscii(s: UTF8String): UTF8String = {
    val str = s.toString
    var plain = true
    var i = 0
    while (plain && i < str.length) {
      val c = str.charAt(i)
      if (c > 127 || (c >= 'A' && c <= 'Z')) plain = false
      i += 1
    }
    if (plain) s
    else
      try UTF8String.fromString(
        java.net.IDN.toASCII(str, java.net.IDN.ALLOW_UNASSIGNED)
          .toLowerCase(java.util.Locale.ROOT))
      // NonFatal, not just IllegalArgumentException: edge JDK punycode
      // paths have thrown unchecked exceptions other than IAE (e.g.
      // StringIndexOutOfBounds) on pathological labels — the pass-through
      // guarantee must be total or a single row kills a 10^10-row stage.
      catch { case scala.util.control.NonFatal(_) => s }
  }
}

/** `nfc_normalize(text)` — codegen'd Unicode NFC canonicalization; the
  * Spark-native twin of DuckDB's `nfc_normalize` (which the oracle runs).
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.nfc(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.nfc($c)")
  override protected def withNewChildInternal(c: Expression): NormalizeNfc =
    copy(c)
  override def prettyName: String = "nfc_normalize"
}

/** `idn_ascii(host)` — codegen'd lowercase-A-label host canonicalization
  * (RFC 3490 ToASCII; `café.example.com` → `xn--caf-dma.example.com`).
  */
case class IdnAscii(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    TextOps.idnAscii(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextOps.idnAscii($c)")
  override protected def withNewChildInternal(c: Expression): IdnAscii =
    copy(c)
  override def prettyName: String = "idn_ascii"
}

object TextExpressions {
  /** Column-API entry point. */
  def nfc_normalize(c: Column): Column =
    Shim.column(NormalizeNfc(Shim.expression(c)))

  /** Column-API entry point. */
  def idn_ascii(c: Column): Column =
    Shim.column(IdnAscii(Shim.expression(c)))

  /** SQL registration: `SELECT nfc_normalize(text) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", es => NormalizeNfc(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "idn_ascii", es => IdnAscii(es.head), "scala_udf")
  }
}
