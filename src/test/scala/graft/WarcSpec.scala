package graft

import java.nio.charset.StandardCharsets.US_ASCII
import org.scalatest.funsuite.AnyFunSuite
import graft.warc.Warc

class WarcSpec extends AnyFunSuite {

  private def rec(wtype: String, uri: String, payload: Array[Byte],
      extraHeader: String = ""): Array[Byte] = {
    val head = (s"WARC/1.0\r\nWARC-Type: $wtype\r\n" +
      s"WARC-Target-URI: $uri\r\nWARC-Date: 2013-01-01T00:00:00Z\r\n" +
      extraHeader + s"Content-Length: ${payload.length}\r\n\r\n")
      .getBytes(US_ASCII)
    head ++ payload ++ "\r\n\r\n".getBytes(US_ASCII)
  }

  test("two records in one buffer, fields + payload bounds") {
    val buf = rec("response", "http://a/", "hello".getBytes(US_ASCII)) ++
      rec("metadata", "http://a/", "via:x".getBytes(US_ASCII))
    val rs = Warc.parse(buf)
    assert(rs.map(_.warcType) == Seq("response", "metadata"))
    assert(rs.forall(_.targetUri == "http://a/"))
    assert(rs.forall(_.version == "WARC/1.0"))
    assert(new String(rs.head.payload, US_ASCII) == "hello")
    assert(rs.head.contentLength == 5)
  }

  test("binary payload with embedded CRLFs is length-bounded, not scanned") {
    val payload = "AB\r\n\r\nCD\r\nEF".getBytes(US_ASCII)
    val rs = Warc.parse(rec("response", "u", payload) ++
      rec("metadata", "u", "m".getBytes(US_ASCII)))
    assert(rs.size == 2)
    assert(rs.head.payload.toSeq == payload.toSeq)
  }

  test("header names are case-insensitive; unknown headers ignored") {
    val buf = ("WARC/1.0\r\nwarc-type: response\r\n" +
      "WARC-TARGET-URI: http://x/\r\nX-Custom: y\r\n" +
      "content-length: 2\r\n\r\nok\r\n\r\n").getBytes(US_ASCII)
    val rs = Warc.parse(buf)
    assert(rs.size == 1)
    assert(rs.head.warcType == "response")
    assert(rs.head.targetUri == "http://x/")
  }

  test("truncated tail record is dropped, parsed prefix kept; garbage → empty") {
    val good = rec("response", "u", "data".getBytes(US_ASCII))
    val truncated = rec("response", "u2", "0123456789".getBytes(US_ASCII))
      .dropRight(8) // cut into the payload
    val rs = Warc.parse(good ++ truncated)
    assert(rs.size == 1)
    assert(rs.head.targetUri == "u")
    assert(Warc.parse("not a warc".getBytes(US_ASCII)).isEmpty)
    assert(Warc.parse(Array.emptyByteArray).isEmpty)
  }

  test("write emits the exact golden envelope bytes") {
    val got = Warc.write("response", "http://a/", "2013-01-01T00:00:00Z",
      "hello".getBytes(US_ASCII))
    val want = rec("response", "http://a/", "hello".getBytes(US_ASCII))
    assert(got.toSeq == want.toSeq)
  }

  test("write/parse round-trip: binary payloads, CRLFs, nested WARC line, empty") {
    val payloads = Seq(
      Array[Byte](0, 1, -1, 13, 10, 13, 10, 127),
      "WARC/1.0\r\nContent-Length: 99\r\n\r\nfake".getBytes(US_ASCII),
      Array.emptyByteArray,
      "héllo wörld".getBytes("UTF-8"))
    val recs = payloads.zipWithIndex.map { case (p, i) =>
      Warc.write(if (i % 2 == 0) "response" else "metadata", s"http://u/$i",
        "1997-01-01T00:00:00Z", p)
    }
    val back = Warc.parse(Warc.concat(recs))
    assert(back.size == payloads.size)
    payloads.zip(back).zipWithIndex.foreach { case ((p, r), i) =>
      assert(r.targetUri == s"http://u/$i")
      assert(r.contentLength == p.length)
      assert(r.payload.toSeq == p.toSeq, s"payload $i")
    }
  }
}
