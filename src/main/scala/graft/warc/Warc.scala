package graft.warc

/** WARC (ISO 28500) envelope parsing — the container format Common-Crawl
  * ships (the BASELINE input_hint's `warc_ts` column is the WARC-Date of
  * exactly these records). The reference crawls live HTTP; a web-scale
  * Spark pipeline ingests the same pages as WARC members, so the engine
  * carries a real record parser: version line + CRLF header block +
  * Content-Length-bounded payload + CRLF CRLF record separator, multiple
  * records per buffer.
  *
  * Parsing is byte-oriented (payloads are arbitrary binary — only headers
  * are ASCII per the spec); header names are case-insensitive. Malformed
  * input returns the records parsed so far (a truncated tail record is
  * dropped, never a crash — the pipeline's panic-recovery rule).
  */
object Warc {

  final case class WarcRecord(
      version: String,
      warcType: String,
      targetUri: String,
      date: String,
      contentLength: Long,
      payload: Array[Byte],
      extra: Map[String, String] = Map.empty)

  private val CRLF = Seq[Byte](13, 10)

  /** Index of the next CRLF at/after `from`, or -1. */
  private def findCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 1 < b.length) {
      if (b(i) == 13 && b(i + 1) == 10) return i
      i += 1
    }
    -1
  }

  /** Serialize one record into its ISO 28500 envelope: version line,
    * fixed-order ASCII header block (WARC-Type, WARC-Target-URI, WARC-Date,
    * Content-Length), blank line, raw payload bytes bounded by
    * Content-Length, then the CRLF CRLF record separator. The exact output
    * side of a 100 TB crawl — records written here re-parse byte-identically
    * with [[parse]] (payloads are arbitrary binary; embedded CRLFs or even a
    * nested "WARC/" line in the payload never confuse the reader because the
    * length header, not a sentinel, bounds it).
    */
  def write(
      warcType: String,
      targetUri: String,
      date: String,
      payload: Array[Byte],
      extraHeaders: Seq[(String, String)] = Nil): Array[Byte] = {
    val head = new StringBuilder(
      96 + (if (targetUri == null) 0 else targetUri.length))
    head.append("WARC/1.0\r\n")
    head.append("WARC-Type: ").append(warcType).append("\r\n")
    // warcinfo records carry no WARC-Target-URI (ISO 28500 §6.2) — a null
    // URI skips the header; parse() leaves targetUri empty for them
    if (targetUri != null)
      head.append("WARC-Target-URI: ").append(targetUri).append("\r\n")
    head.append("WARC-Date: ").append(date).append("\r\n")
    extraHeaders.foreach { case (k, v) =>
      head.append(k).append(": ").append(v).append("\r\n")
    }
    head.append("Content-Length: ").append(payload.length).append("\r\n\r\n")
    val h = head.toString.getBytes("UTF-8") // ASCII-identical for ASCII URIs
    val out = new Array[Byte](h.length + payload.length + 4)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(payload, 0, out, h.length, payload.length)
    out(out.length - 4) = 13; out(out.length - 3) = 10
    out(out.length - 2) = 13; out(out.length - 1) = 10
    out
  }

  /** Concatenate already-serialized records into one member buffer (the
    * per-partition file body a WARC sink emits).
    */
  def concat(records: Seq[Array[Byte]]): Array[Byte] = {
    val total = records.iterator.map(_.length).sum
    val out = new Array[Byte](total)
    var pos = 0
    records.foreach { r =>
      System.arraycopy(r, 0, out, pos, r.length); pos += r.length
    }
    out
  }

  /** Parse every complete record in the buffer. */
  def parse(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var ok = true
    while (ok && pos < bytes.length) {
      // skip inter-record CRLFs
      while (pos + 1 < bytes.length && bytes(pos) == 13 && bytes(pos + 1) == 10)
        pos += 2
      if (pos >= bytes.length) ok = false
      else {
        // version line
        val vEnd = findCrlf(bytes, pos)
        if (vEnd < 0) ok = false
        else {
          val version = new String(bytes, pos, vEnd - pos, "US-ASCII")
          if (!version.startsWith("WARC/")) ok = false
          else {
            var p = vEnd + 2
            var warcType = ""
            var targetUri = ""
            var date = ""
            var contentLength = -1L
            var extra = Map.empty[String, String]
            // header block until blank line
            var headersDone = false
            while (!headersDone && ok) {
              val hEnd = findCrlf(bytes, p)
              if (hEnd < 0) ok = false
              else if (hEnd == p) { headersDone = true; p += 2 }
              else {
                val line = new String(bytes, p, hEnd - p, "US-ASCII")
                val colon = line.indexOf(':')
                if (colon > 0) {
                  val k = line.substring(0, colon).trim.toLowerCase
                  val v = line.substring(colon + 1).trim
                  k match {
                    case "warc-type" => warcType = v
                    case "warc-target-uri" => targetUri = v
                    case "warc-date" => date = v
                    case "content-length" =>
                      try contentLength = v.toLong
                      catch { case _: NumberFormatException => () }
                    // unknown headers kept (lowercased names) — revisit
                    // records carry WARC-Refers-To-* / WARC-Profile here
                    case other => extra = extra.updated(other, v)
                  }
                }
                p = hEnd + 2
              }
            }
            if (ok && contentLength >= 0 && contentLength <= Int.MaxValue &&
                p + contentLength <= bytes.length) {
              val payload = java.util.Arrays.copyOfRange(
                bytes, p, p + contentLength.toInt)
              out += WarcRecord(version, warcType, targetUri, date,
                contentLength, payload, extra)
              pos = p + contentLength.toInt
            } else ok = false // truncated tail record: stop, keep parsed
          }
        }
      }
    }
    out.result()
  }
}
