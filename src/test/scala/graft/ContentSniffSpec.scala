package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ContentSniff

class ContentSniffSpec extends AnyFunSuite {

  test("tag signatures match case-insensitively after whitespace/BOM skip") {
    assert(ContentSniff.sniff("<!DOCTYPE html><html>") == "text/html")
    assert(ContentSniff.sniff("  \n\t<HTML lang=en>") == "text/html")
    assert(ContentSniff.sniff("﻿<html>") == "text/html")
    assert(ContentSniff.sniff("<head><title>t</title>") == "text/html")
    assert(ContentSniff.sniff("<body>x") == "text/html")
    assert(ContentSniff.sniff("<?xml version=\"1.0\"?>") == "text/xml")
    assert(ContentSniff.sniff("%PDF-1.7 blah") == "application/pdf")
    assert(ContentSniff.sniff("{\"k\": 1}") == "application/json")
    assert(ContentSniff.sniff("[1, 2]") == "application/json")
  }

  test("non-matches fall to text/plain; null to octet-stream") {
    assert(ContentSniff.sniff("hello world") == "text/plain")
    assert(ContentSniff.sniff("<div>html-ish but not a doc tag") == "text/plain")
    assert(ContentSniff.sniff("pdf-1.7 lowercase no percent") == "text/plain")
    assert(ContentSniff.sniff("") == "text/plain")
    assert(ContentSniff.sniff(null) == "application/octet-stream")
  }

  test("scan is bounded: signatures beyond MaxSniff are not seen") {
    val far = (" " * (ContentSniff.MaxSniff + 10)) + "<html>"
    assert(ContentSniff.sniff(far) == "text/plain")
    // and a huge body with a leading signature still sniffs in O(prefix)
    val big = "<html>" + ("x" * 10000000)
    assert(ContentSniff.sniff(big) == "text/html")
  }
}
