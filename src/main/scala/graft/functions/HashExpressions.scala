package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic text-hash primitives as native Catalyst expressions with
  * `doGenCode` — they stay inside whole-stage codegen (no UDF
  * serialization, no row-at-a-time iterator breaks), which is the preferred
  * extension path for hot-loop scalar functions (SURVEY.md §4).
  *
  * Static eval helpers live on the companion so generated code calls one
  * JVM-static method — same shape Spark's own hash expressions use.
  */
object HashOps {
  final val Mod = 1000000007L
  final val Base = 31L

  /** Whole-string polynomial hash: fold h = (h·31 + codepoint) mod 1e9+7.
    * Matches the DuckDB list_reduce oracle exactly.
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * Base + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Rolling min-fingerprint (winnowing-lite): min polynomial hash over all
    * length-`n` CODEPOINT windows, computed in O(len) with the Karp-Rabin
    * rolling update. Codepoints (not UTF-16 units) keep this consistent
    * with polyHash and with the DuckDB oracle for supplementary-plane
    * characters. Short strings fall back to the whole-string hash.
    */
  def rollingMinHash(s: UTF8String, n: Int): Long = {
    val cps = s.toString.codePoints.toArray
    if (cps.length < n || n <= 0) return polyHash(s)
    // precompute base^(n-1) mod p for the outgoing codepoint
    var pow = 1L
    var k = 1
    while (k < n) { pow = (pow * Base) % Mod; k += 1 }
    var h = 0L
    var i = 0
    while (i < n) { h = (h * Base + cps(i)) % Mod; i += 1 }
    var min = h
    while (i < cps.length) {
      val out = (cps(i - n).toLong * pow) % Mod
      h = ((h - out + Mod * Base) % Mod * Base + cps(i)) % Mod
      if (h < min) min = h
      i += 1
    }
    min
  }
}

/** `poly_hash(text)` — codegen'd whole-string polynomial fingerprint. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.polyHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashOps.polyHash($c)")
  override protected def withNewChildInternal(c: Expression): PolyHash = copy(c)
  override def prettyName: String = "poly_hash"
}

/** `rolling_min_hash(text, n)` — codegen'd min n-gram rolling fingerprint. */
case class RollingMinHash(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    HashOps.rollingMinHash(v.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashOps.rollingMinHash($c, $n)")
  override protected def withNewChildInternal(c: Expression): RollingMinHash =
    copy(child = c)
  override def prettyName: String = "rolling_min_hash"
}

object HashExpressions {
  /** Column-API entry points. */
  def poly_hash(c: Column): Column = Shim.column(PolyHash(Shim.expression(c)))
  def rolling_min_hash(c: Column, n: Int): Column =
    Shim.column(RollingMinHash(Shim.expression(c), n))

  /** SQL registration: `SELECT poly_hash(text) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash",
      es => PolyHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rolling_min_hash",
      es => RollingMinHash(es.head,
        es(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }
}
