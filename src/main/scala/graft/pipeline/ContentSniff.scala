package graft.pipeline

/** Content-type sniffing over the leading bytes of a response body — the
  * WHATWG MIME-sniffing subset a crawler needs when servers lie or omit
  * Content-Type (the reference's charset path pulls
  * golang.org/x/net/html/charset, which sniffs the same way Go's
  * `http.DetectContentType` does: inspect a bounded prefix, never the whole
  * body).
  *
  * Deterministic, allocation-light, bounded to the first `MaxSniff`
  * chars — safe to run row-at-a-time inside a partition map over 10^10
  * pages. Only the corpus-observable branches are implemented: HTML, XML,
  * JSON, PDF, plain text.
  */
object ContentSniff {
  final val MaxSniff = 512

  /** Case-insensitive startsWith at offset. */
  private def hasPrefix(s: String, from: Int, p: String): Boolean = {
    if (from + p.length > s.length) return false
    var i = 0
    while (i < p.length) {
      val a = Character.toLowerCase(s.charAt(from + i))
      if (a != Character.toLowerCase(p.charAt(i))) return false
      i += 1
    }
    true
  }

  /** Sniff a body prefix (already decoded to chars; binary-safe callers
    * pass a Latin-1 view). Mirrors DetectContentType's scan order: skip
    * BOM + ASCII whitespace, match tag/signature prefixes, else text.
    */
  def sniff(body: String): String = {
    if (body == null) return "application/octet-stream"
    val s = if (body.length > MaxSniff) body.substring(0, MaxSniff) else body
    var i = 0
    if (s.nonEmpty && s.charAt(0) == '\uFEFF') i = 1 // BOM
    while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    if (hasPrefix(s, i, "<!doctype html") || hasPrefix(s, i, "<html") ||
        hasPrefix(s, i, "<head") || hasPrefix(s, i, "<body"))
      "text/html"
    else if (hasPrefix(s, i, "<?xml")) "text/xml"
    else if (hasPrefix(s, i, "%PDF-")) "application/pdf"
    else if (i < s.length && (s.charAt(i) == '{' || s.charAt(i) == '['))
      "application/json"
    else "text/plain"
  }
}
