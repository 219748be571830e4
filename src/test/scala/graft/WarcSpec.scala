package graft

import graft.sources.Warc
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._

/** Unit contracts for the WARC/WET container source (the l45 registry
  * row carries the closed-form extraction differential; these pin the
  * record grammar, the HTTP-payload split, gzip members, and the S16
  * malformed-tolerance conventions on hand-built containers). */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def http(body: String): Array[Byte] =
    ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)
      .getBytes(UTF_8)

  test("L50: round trip — written records parse back field-for-field (WET and HTTP response)") {
    val wet = Warc.buildWet(Seq(
      ("http://a.example.com/1", "first page text"),
      ("http://b.example.com/2", "second page\nwith a newline")))
    val (rs, bad) = Warc.parseAll(wet)
    assert(bad === 0 && rs.size === 2)
    assert(rs.map(_.warcType).distinct === Seq("conversion"))
    assert(rs.map(_.targetUri) ===
      Seq("http://a.example.com/1", "http://b.example.com/2"))
    assert(rs.map(Warc.payloadText) ===
      Seq("first page text", "second page\nwith a newline"))
    assert(rs.forall(r => r.contentLength === r.block.length.toLong))
    // HTTP response record: payload strips the status line + headers
    val resp = Warc.writeRecord("response", "http://c.example.com/3",
      "application/http; msgtype=response", http("<p>hello</p>"))
    val (rs2, bad2) = Warc.parseAll(resp)
    assert(bad2 === 0 && rs2.size === 1)
    assert(Warc.payloadText(rs2.head) === "<p>hello</p>")
  }

  test("L50: gzip members — one member per record (the CommonCrawl layout) parses identically") {
    val pages = (1 to 5).map(i => (s"http://g.example.com/$i", s"text $i"))
    val gz = Warc.buildWet(pages, gzip = true)
    assert(gz(0) == 0x1f.toByte && gz(1) == 0x8b.toByte)
    val (rs, bad) = Warc.parseAll(gz)
    assert(bad === 0 && rs.map(_.targetUri) === pages.map(_._1))
    assert(rs.map(Warc.payloadText) === pages.map(_._2))
    // JDK gzip semantics pin (the l45 plant relies on it): NON-gzip
    // garbage after the last member is absorbed silently — the reader
    // stops at the final valid member, so such garbage is unreachable
    // and cannot be counted
    val (rsG, badG) = Warc.parseAll(gz ++ "trailing junk\r\n".getBytes(UTF_8))
    assert(rsG.size === pages.size && badG === 0)
  }

  test("L50: malformed tolerance (the S16 convention) — bad records are counted and skipped, the rest parse") {
    val good1 = Warc.writeRecord("conversion", "http://ok.example.com/1",
      "text/plain", "good one".getBytes(UTF_8))
    val good2 = Warc.writeRecord("conversion", "http://ok.example.com/2",
      "text/plain", "good two".getBytes(UTF_8))
    // bad version line
    val badVersion = "WORC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n".getBytes(UTF_8)
    // missing Content-Length
    val noLen = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\n".getBytes(UTF_8)
    // declared block runs past the container
    val truncated = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8)
    def cat(parts: Array[Byte]*): Array[Byte] = parts.reduce(_ ++ _)
    val (rs1, bad1) = Warc.parseAll(cat(badVersion, good1, noLen, good2))
    assert(rs1.map(_.targetUri) ===
      Seq("http://ok.example.com/1", "http://ok.example.com/2"))
    assert(bad1 === 2, s"two malformed units, got $bad1")
    // a truncated tail loses only itself
    val (rs2, bad2) = Warc.parseAll(cat(good1, truncated))
    assert(rs2.size === 1 && bad2 === 1)
    // leading garbage before the first record is one malformed unit;
    // recovery scans for a '\r\nWARC/' boundary (a bare 'WARC/' can
    // legitimately appear inside a record BODY, so line-start anchoring
    // is what keeps block content from masquerading as a record)
    val (rs3, bad3) = Warc.parseAll(cat("garbage line\r\n".getBytes(UTF_8), good1))
    assert(rs3.size === 1 && bad3 === 1)
    // a record whose BODY contains 'WARC/' at a line start must not be
    // split: Content-Length framing wins
    val tricky = Warc.writeRecord("conversion", "http://t.example.com/1",
      "text/plain", "body with\r\nWARC/1.0\r\nlooking text".getBytes(UTF_8))
    val (rs3b, bad3b) = Warc.parseAll(cat(tricky, good2))
    assert(rs3b.size === 2 && bad3b === 0,
      s"body WARC/ must not split records: ${rs3b.size}/$bad3b")
    // corrupt gzip tail: the records already inflated survive
    val gz = Warc.buildWet(Seq(("http://g.example.com/1", "alpha"),
      ("http://g.example.com/2", "beta")), gzip = true)
    val cut = java.util.Arrays.copyOfRange(gz, 0, gz.length - 6)
    val (rs4, bad4) = Warc.parseAll(cut)
    assert(rs4.nonEmpty && bad4 >= 1,
      s"partial gzip must yield early records + a malformed count: ${rs4.size}/$bad4")
  }

  test("L50: header folding and bracketed URIs") {
    val rec = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: <http://x.example.com/long\r\n path>\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val (rs, bad) = Warc.parseAll(rec)
    assert(bad === 0 && rs.size === 1)
    assert(rs.head.targetUri === "http://x.example.com/long path")
  }

  test("L50: pages() explodes containers, filters framing records, stamps the malformed count; a dead container leaves a quarantine row") {
    val warcinfo = Warc.writeRecord("warcinfo", "", "application/warc-fields",
      "software: test\r\n".getBytes(UTF_8))
    val good = Warc.buildWet(Seq(("http://p.example.com/1", "one"),
      ("http://p.example.com/2", "two")))
    // a response record (the raw-crawl form): page_text = the HTTP body
    val resp = Warc.writeRecord("response", "http://p.example.com/3",
      "application/http; msgtype=response", http("<p>three</p>"))
    val mixed = warcinfo ++ good ++ resp ++
      "WARC/1.0\r\nbroken".getBytes(UTF_8) // malformed tail
    val dead = "not a warc at all".getBytes(UTF_8)
    val df = Seq((1L, mixed), (2L, dead)).toDF("file_id", "bytes")
    val out = Warc.pages(df, "bytes")
      .select($"file_id", $"url", $"page_text", $"warc_type", $"malformed")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    val byFile = out.groupBy(_._1)
    // container 1: warcinfo filtered, two conversion pages + the
    // header-stripped response body, count 1
    assert(byFile(1L).map(x => (x._2, x._3, x._4, x._5)).toSet === Set(
      ("http://p.example.com/1", "one", "conversion", 1),
      ("http://p.example.com/2", "two", "conversion", 1),
      ("http://p.example.com/3", "<p>three</p>", "response", 1)))
    // container 2: one all-NULL quarantine row carrying the count
    assert(byFile(2L).toSeq === Seq((2L, null, null, null, 1)))
  }
}
