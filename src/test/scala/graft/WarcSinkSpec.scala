package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sinks.WarcSink
import graft.warc.Warc

/** Partitioned WARC sink: plan semantics (revisit dedup), envelope bytes,
  * per-partition member files, parse round-trip of the revisit headers.
  */
class WarcSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** 8 captures over 3 distinct payloads (duplicate content across urls). */
  private def captures = {
    val rows = Seq(
      ("http://a/1", "2013-01-01T00:00:01Z", "alpha"),
      ("http://b/1", "2013-01-01T00:00:02Z", "alpha"),
      ("http://c/1", "2013-01-01T00:00:03Z", "beta"),
      ("http://a/2", "2013-01-01T00:00:00Z", "alpha"),
      ("http://d/1", "2013-01-01T00:00:04Z", "gamma"),
      ("http://e/1", "2013-01-01T00:00:05Z", "beta"),
      ("http://f/1", "2013-01-01T00:00:06Z", "alpha"),
      ("http://g/1", "2013-01-01T00:00:07Z", "gamma"))
    rows.toDF("url", "ts", "text")
      .withColumn("payload", col("text").cast("binary"))
      .select("url", "ts", "payload")
  }

  private def readMembers(dir: String): Seq[Warc.WarcRecord] = {
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".warc")))
    files.toSeq.flatMap(f => Warc.parse(Files.readAllBytes(Paths.get(f))))
  }

  test("dedup plan: one response per digest, revisits point at the first " +
    "capture by (ts, url), payload-free") {
    val dir = Files.createTempDirectory("warcsink").toString
    WarcSink.write(captures.repartition(3), dir, dedup = true)
    val recs = readMembers(dir)
    assert(recs.length == 8)

    val responses = recs.filter(_.warcType == "response")
    val revisits = recs.filter(_.warcType == "revisit")
    assert(responses.length == 3) // alpha, beta, gamma
    assert(revisits.length == 5)

    // first capture per content: alpha -> a/2 (earliest ts), beta -> c/1,
    // gamma -> d/1
    assert(responses.map(_.targetUri).toSet ==
      Set("http://a/2", "http://c/1", "http://d/1"))
    // responses carry the full payload
    val byUri = responses.map(r => r.targetUri -> r).toMap
    assert(new String(byUri("http://a/2").payload, UTF_8) == "alpha")
    assert(new String(byUri("http://c/1").payload, UTF_8) == "beta")

    // every revisit: empty payload, refers-to the digest's response,
    // revisit profile + payload digest headers round-trip through parse
    revisits.foreach { r =>
      assert(r.contentLength == 0 && r.payload.isEmpty)
      assert(r.extra("warc-profile") == WarcSink.RevisitProfile)
      assert(r.extra.contains("warc-payload-digest"))
      val orig = r.extra("warc-refers-to-target-uri")
      assert(byUri.contains(orig))
      assert(r.extra("warc-refers-to-date") == byUri(orig).date)
      // same content digest as its original
      assert(r.extra("warc-payload-digest") ==
        byUri(orig).extra("warc-payload-digest"))
    }
    // alpha has 3 revisits, beta 1, gamma 1
    val counts = revisits
      .groupBy(_.extra("warc-refers-to-target-uri")).map { case (k, v) =>
        k -> v.length
      }
    assert(counts == Map(
      "http://a/2" -> 3, "http://c/1" -> 1, "http://d/1" -> 1))
  }

  test("no-dedup mode writes every capture as a full response") {
    val dir = Files.createTempDirectory("warcsink").toString
    WarcSink.write(captures, dir, dedup = false)
    val recs = readMembers(dir)
    assert(recs.length == 8)
    assert(recs.forall(_.warcType == "response"))
    assert(recs.forall(r => r.payload.nonEmpty))
    assert(recs.map(_.targetUri).toSet == Set(
      "http://a/1", "http://a/2", "http://b/1", "http://c/1",
      "http://d/1", "http://e/1", "http://f/1", "http://g/1"))
  }

  test("one member file per non-empty partition, no empty members") {
    val dir = Files.createTempDirectory("warcsink").toString
    // 2 rows into 8 partitions -> at most 2 non-empty members
    WarcSink.write(captures.limit(2).repartition(8), dir, dedup = false)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(files.nonEmpty && files.length <= 2)
    val recs = readMembers(dir)
    assert(recs.length == 2)
    files.foreach(f =>
      assert(Files.size(Paths.get(f)) > 0, s"empty member $f"))
  }

  test("compressed members: one gzip member per record, multi-member " +
    "stream decompresses to the identical uncompressed archive") {
    val dir = Files.createTempDirectory("warcsink").toString
    WarcSink.write(captures.repartition(2), dir, dedup = true,
      compress = true)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
    assert(files.nonEmpty && files.forall(_.endsWith(".warc.gz")))
    val recs = files.toSeq.flatMap { f =>
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(Files.readAllBytes(Paths.get(f))))
      val all = in.readAllBytes() // multi-member: reads every member
      Warc.parse(all)
    }
    assert(recs.length == 8)
    assert(recs.count(_.warcType == "response") == 3)
    assert(recs.count(_.warcType == "revisit") == 5)
    // each record is its own gzip member, so every member header's magic
    // (1f 8b 08) appears at least once per record across the files
    val raw = files.toSeq.map(f => Files.readAllBytes(Paths.get(f)))
    val magicCount = raw.map { b =>
      (0 until b.length - 2).count(i =>
        b(i) == 0x1f.toByte && b(i + 1) == 0x8b.toByte && b(i + 2) == 8.toByte)
    }.sum
    assert(magicCount >= 8)
    // and per-member framing is real: gzipMember(x) alone decompresses to x
    val one = WarcSink.gzipMember("solo".getBytes(UTF_8))
    val back = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(one)).readAllBytes()
    assert(new String(back, UTF_8) == "solo")
  }

  test("extra headers written by the sink parse back on arbitrary payloads") {
    val payload = Array[Byte](0, 13, 10, 13, 10, 87, 65, 82, 67, 47) // binary
    val bytes = Warc.write("response", "http://x/", "2013-01-01T00:00:00Z",
      payload, Seq("WARC-Payload-Digest" -> "md5:abc"))
    val back = Warc.parse(bytes)
    assert(back.length == 1)
    assert(back.head.payload.toSeq == payload.toSeq)
    assert(back.head.extra == Map("warc-payload-digest" -> "md5:abc"))
  }

  test("warcinfo leader: every member opens with the self-description " +
    "record (no Target-URI, warc-fields payload), data records follow") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val dir = Files.createTempDirectory("warcinfo").toString
    val df = Seq(
      ("http://a/", "2023-01-01T00:00:00Z", "pa".getBytes(UTF_8)),
      ("http://b/", "2023-01-01T00:00:01Z", "pb".getBytes(UTF_8)))
      .toDF("url", "ts", "payload").repartition(1)
    WarcSink.write(df, dir, info = Some(("2023-06-01T00:00:00Z",
      Seq("software" -> "geziyorspark", "format" -> "WARC File Format 1.0"))))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".warc"))
    assert(files.length == 1)
    val recs = Warc.parse(Files.readAllBytes(files.head.toPath))
    assert(recs.length == 3)
    val info = recs.head
    assert(info.warcType == "warcinfo")
    assert(info.targetUri == "")
    assert(info.date == "2023-06-01T00:00:00Z")
    assert(info.extra("content-type") == "application/warc-fields")
    assert(new String(info.payload, UTF_8) ==
      "software: geziyorspark\r\nformat: WARC File Format 1.0\r\n")
    assert(recs.tail.map(_.targetUri).toSet == Set("http://a/", "http://b/"))
    // round-trip stability: a warcinfo record with no Target-URI re-writes
    // byte-identically through write()
    val again = Warc.write("warcinfo", null, info.date, info.payload,
      Seq("Content-Type" -> "application/warc-fields"))
    val r2 = Warc.parse(again).head
    assert(r2.warcType == info.warcType && r2.targetUri == info.targetUri &&
      r2.date == info.date && r2.extra == info.extra &&
      r2.payload.toSeq == info.payload.toSeq)
  }
}
