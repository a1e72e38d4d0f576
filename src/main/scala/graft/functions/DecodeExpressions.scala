package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.pipeline.CharsetDecode

/** Charset decode + IsHTML as native codegen'd Catalyst expressions
  * (SURVEY.md §4's optional decode/isHtml fusion into whole-stage codegen;
  * reference semantics: client/client.go:140-154 charset ladder,
  * client/response.go:37-45 IsHTML). The crawl pipeline fuses decode into
  * its one parse mapPartitions pass; these expressions serve the QUERY
  * side, where a bare decode/IsHTML over a corpus column would otherwise
  * be a row-at-a-time UDF breaking the codegen span.
  *
  * Null semantics follow the reference, NOT SQL null-intolerance:
  *  - decode_body(NULL, ct) = NULL (no body, nothing to decode);
  *  - decode_body(body, NULL) = windows-1252-ladder decode (a missing
  *    Content-Type header never nulls the body);
  *  - is_html(NULL) = false (response.go:38 empty header check).
  */
object DecodeOps {
  def decodeBody(body: Array[Byte], ct: UTF8String): UTF8String =
    UTF8String.fromString(
      CharsetDecode.decode(body, if (ct == null) null else ct.toString))
  def isHtml(ct: UTF8String): Boolean =
    CharsetDecode.isHtml(if (ct == null) null else ct.toString)
}

/** `decode_body(html: binary, content_type: string)` → string. */
case class DecodeBody(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable
  override def eval(input: InternalRow): Any = {
    val b = left.eval(input)
    if (b == null) null
    else DecodeOps.decodeBody(b.asInstanceOf[Array[Byte]],
      right.eval(input).asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code = code"""
      ${l.code}
      boolean ${ev.isNull} = ${l.isNull};
      org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
      if (!${ev.isNull}) {
        ${r.code}
        ${ev.value} = graft.functions.DecodeOps.decodeBody(
          ${l.value}, ${r.isNull} ? null : ${r.value});
      }""")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeBody =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "decode_body"
}

/** `is_html(content_type: string)` → boolean, never null. */
case class IsHtmlCt(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any =
    DecodeOps.isHtml(child.eval(input).asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = false;
      boolean ${ev.value} = graft.functions.DecodeOps.isHtml(
        ${c.isNull} ? null : ${c.value});""")
  }
  override protected def withNewChildInternal(c: Expression): IsHtmlCt = copy(c)
  override def prettyName: String = "is_html"
}

object DecodeExpressions {
  def decode_body(body: Column, ct: Column): Column =
    Shim.column(DecodeBody(Shim.expression(body), Shim.expression(ct)))
  def is_html(ct: Column): Column = Shim.column(IsHtmlCt(Shim.expression(ct)))

  /** SQL registration: `SELECT decode_body(html, content_type) FROM …`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("decode_body",
      es => DecodeBody(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("is_html",
      es => IsHtmlCt(es.head), "scala_udf")
  }
}
