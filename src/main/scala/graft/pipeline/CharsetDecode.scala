package graft.pipeline

import java.nio.charset.{Charset, StandardCharsets}

/** Deterministic body→UTF-16 String decode, the Spark analog of the
  * reference's charset handling (client/client.go:140-154: explicit
  * req.Encoding override, else sniff via Content-Type header / body meta,
  * else UTF-8; skipped for HEAD or empty body).
  */
object CharsetDecode {

  private val CtCharset = """(?i)charset\s*=\s*"?([\w\-]+)"?""".r
  private val MetaCharset =
    """(?i)<meta[^>]*charset\s*=\s*["']?([\w\-]+)""".r

  def charsetOf(name: String): Option[Charset] =
    try Some(Charset.forName(name)) catch { case _: Exception => None }

  /** BOM sniff (x/net/html/charset.DetermineEncoding — the resolver behind
    * the reference's charset.NewReader): a UTF-8 / UTF-16 byte-order mark
    * is CERTAIN and overrides the Content-Type header. Returns the charset
    * and the BOM length to skip.
    */
  private[graft] def bomOf(body: Array[Byte]): Option[(Charset, Int)] = {
    if (body == null) None
    else if (body.length >= 3 && (body(0) & 0xff) == 0xef &&
        (body(1) & 0xff) == 0xbb && (body(2) & 0xff) == 0xbf)
      Some((StandardCharsets.UTF_8, 3))
    else if (body.length >= 2 && (body(0) & 0xff) == 0xfe &&
        (body(1) & 0xff) == 0xff)
      Some((StandardCharsets.UTF_16BE, 2))
    else if (body.length >= 2 && (body(0) & 0xff) == 0xff &&
        (body(1) & 0xff) == 0xfe)
      Some((StandardCharsets.UTF_16LE, 2))
    else None
  }

  /** Resolution order (mirrors the reference: req.Encoding override first,
    * client/client.go:140-154, then DetermineEncoding's certainty ladder):
    * explicit encoding > BOM (certain — overrides a lying Content-Type) >
    * Content-Type charset param > <meta charset> in the first 1024 bytes >
    * windows-1252 (DetermineEncoding's sniff fallback; identical to UTF-8
    * on ASCII bodies).
    */
  def decode(body: Array[Byte], contentType: String,
      encoding: String = null): String = {
    if (body == null || body.isEmpty) return ""
    val explicit = Option(encoding).filter(_.nonEmpty).flatMap(charsetOf)
    explicit match {
      case Some(cs) => new String(body, cs)
      case None =>
        bomOf(body) match {
          case Some((cs, skip)) =>
            new String(body, skip, body.length - skip, cs)
          case None =>
            val fromCt = Option(contentType)
              .flatMap(ct => CtCharset.findFirstMatchIn(ct).map(_.group(1)))
              .flatMap(charsetOf)
            val cs = fromCt.getOrElse {
              val head = new String(
                body, 0, math.min(1024, body.length), StandardCharsets.ISO_8859_1)
              MetaCharset.findFirstMatchIn(head).map(_.group(1)).flatMap(charsetOf)
                .getOrElse(Charset.forName("windows-1252"))
            }
            new String(body, cs)
        }
    }
  }

  /** CharsetDetectDisabled path (options.go:38, client/client.go:146-152):
    * no charset.NewReader — bytes pass through as-is; downstream consumers
    * treat them as UTF-8, exactly like Go string conversion of raw bytes.
    */
  def decodeRaw(body: Array[Byte]): String =
    if (body == null || body.isEmpty) "" else
      new String(body, StandardCharsets.UTF_8)

  /** Body-size cap applied BEFORE decode (client/client.go:137: the reference
    * truncates the byte stream at MaxBodySize).
    */
  def truncate(body: Array[Byte], maxBodySize: Long): Array[Byte] =
    if (body == null || body.length <= maxBodySize) body
    else java.util.Arrays.copyOf(body, maxBodySize.toInt)

  /** IsHTML predicate (client/response.go:37-45). */
  def isHtml(contentType: String): Boolean =
    contentType != null && Seq(
      "text/html", "application/xhtml+xml", "application/vnd.wap.xhtml+xml")
      .exists(contentType.contains)
}
