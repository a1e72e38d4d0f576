package graft

import java.nio.charset.StandardCharsets
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.CharsetDecode

/** Charset resolution ladder incl. the BOM certainty rule
  * (x/net/html/charset.DetermineEncoding behind the reference's
  * charset.NewReader): explicit > BOM > Content-Type > meta >
  * windows-1252 sniff fallback.
  */
class CharsetDecodeSpec extends AnyFunSuite {

  private val text = "héllo wörld"

  test("UTF-16LE BOM overrides a lying Content-Type header") {
    val bom = Array(0xff.toByte, 0xfe.toByte)
    val body = bom ++ text.getBytes(StandardCharsets.UTF_16LE)
    // header lies: claims utf-8; the BOM is certain
    assert(CharsetDecode.decode(body, "text/html; charset=utf-8") == text)
  }

  test("UTF-16BE BOM detected and stripped") {
    val bom = Array(0xfe.toByte, 0xff.toByte)
    val body = bom ++ text.getBytes(StandardCharsets.UTF_16BE)
    assert(CharsetDecode.decode(body, "text/html") == text)
  }

  test("UTF-8 BOM stripped (no stray \\uFEFF in the decoded text)") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val body = bom ++ text.getBytes(StandardCharsets.UTF_8)
    val got = CharsetDecode.decode(body, "text/html; charset=iso-8859-1")
    assert(got == text)
    assert(!got.startsWith("﻿"))
  }

  test("explicit encoding still beats the BOM (req.Encoding override)") {
    val bom = Array(0xef.toByte, 0xbb.toByte, 0xbf.toByte)
    val body = bom ++ "abc".getBytes(StandardCharsets.UTF_8)
    val got = CharsetDecode.decode(body, "text/html", encoding = "ISO-8859-1")
    assert(got.startsWith("ï»¿")) // BOM bytes read as latin-1
  }

  test("Content-Type charset honored when no BOM") {
    val body = text.getBytes("ISO-8859-1")
    assert(CharsetDecode.decode(body, "text/html; charset=iso-8859-1") == text)
  }

  test("meta charset sniffed from the head; windows-1252 fallback") {
    val metaHtml = s"""<html><head><meta charset="iso-8859-9"></head><body>ış</body></html>"""
    val body = metaHtml.getBytes("ISO-8859-9")
    assert(CharsetDecode.decode(body, "text/html").contains("ış"))
    // no charset anywhere: 0x93/0x94 are windows-1252 smart quotes (would be
    // U+FFFD under a UTF-8 fallback)
    val w1252 = Array[Byte]('a', 0x93.toByte, 'b', 0x94.toByte)
    assert(CharsetDecode.decode(w1252, "text/html") == "a“b”")
  }
}
