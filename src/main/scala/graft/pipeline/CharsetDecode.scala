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

  /** Resolution order: explicit encoding > Content-Type charset param >
    * <meta charset> in the first 1024 bytes > UTF-8.
    */
  def decode(body: Array[Byte], contentType: String,
      encoding: String = null): String = {
    if (body == null || body.isEmpty) return ""
    val explicit = Option(encoding).filter(_.nonEmpty).flatMap(charsetOf)
    val fromCt = Option(contentType)
      .flatMap(ct => CtCharset.findFirstMatchIn(ct).map(_.group(1)))
      .flatMap(charsetOf)
    val cs = explicit.orElse(fromCt).getOrElse {
      val head = new String(
        body, 0, math.min(1024, body.length), StandardCharsets.ISO_8859_1)
      MetaCharset.findFirstMatchIn(head).map(_.group(1)).flatMap(charsetOf)
        .getOrElse(StandardCharsets.UTF_8)
    }
    new String(body, cs)
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
