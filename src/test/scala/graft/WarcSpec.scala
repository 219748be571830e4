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

  // ---- member-wise streaming parse (round 18): parseAll now walks
  // gzip members one at a time through an incremental record scanner;
  // parseAllBuffered (the original whole-buffer walk) is retained as
  // the differential oracle these cases hold it to, bit-for-bit ----

  private def assertSame(container: Array[Byte], label: String = ""): Unit = {
    val (a, ma) = Warc.parseAll(container)
    val (b, mb) = Warc.parseAllBuffered(container)
    assert(ma === mb, s"malformed count diverged [$label]: streaming=$ma buffered=$mb")
    assert(a.size === b.size, s"record count diverged [$label]: ${a.size}/${b.size}")
    a.zip(b).foreach { case (x, y) =>
      assert(x.warcType === y.warcType, s"warcType [$label]")
      assert(x.targetUri === y.targetUri, s"targetUri [$label]")
      assert(x.contentType === y.contentType, s"contentType [$label]")
      assert(x.contentLength === y.contentLength, s"contentLength [$label]")
      assert(java.util.Arrays.equals(x.block, y.block), s"block bytes [$label]")
    }
  }

  test("L50 member-wise: streaming parse ≡ buffered parse bit-for-bit on every fixture class") {
    def cat(parts: Array[Byte]*): Array[Byte] =
      if (parts.isEmpty) Array.empty else parts.reduce(_ ++ _)
    val good1 = Warc.writeRecord("conversion", "http://ok.example.com/1",
      "text/plain", "good one".getBytes(UTF_8))
    val good2 = Warc.writeRecord("conversion", "http://ok.example.com/2",
      "text/plain", "good two".getBytes(UTF_8))
    val resp = Warc.writeRecord("response", "http://c.example.com/3",
      "application/http; msgtype=response", http("<p>hello</p>"))
    val folded = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: <http://x.example.com/long\r\n path>\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes(UTF_8)
    val badVersion = "WORC/1.0\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n".getBytes(UTF_8)
    val noLen = "WARC/1.0\r\nWARC-Type: conversion\r\n\r\n".getBytes(UTF_8)
    val runsPast = "WARC/1.0\r\nWARC-Type: conversion\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8)
    val tricky = Warc.writeRecord("conversion", "http://t.example.com/1",
      "text/plain", "body with\r\nWARC/1.0\r\nlooking text".getBytes(UTF_8))
    val gz = Warc.buildWet((1 to 5).map(i =>
      (s"http://g.example.com/$i", s"text $i")), gzip = true)
    val fixtures = Seq[(String, Array[Byte])](
      "empty" -> Array.empty[Byte],
      "one byte" -> Array('W'.toByte),
      "partial magic tail" -> "WAR".getBytes(UTF_8),
      "good pair" -> cat(good1, good2),
      "http response" -> resp,
      "folded header" -> folded,
      "bad version + goods" -> cat(badVersion, good1, noLen, good2),
      "truncated tail" -> cat(good1, runsPast),
      "leading garbage" -> cat("garbage line\r\n".getBytes(UTF_8), good1),
      "inter-record garbage" -> cat(good1, "junk\r\n".getBytes(UTF_8), good2),
      "body WARC/ framing" -> cat(tricky, good2),
      "EOF at block end" -> java.util.Arrays.copyOfRange(good1, 0, good1.length - 4),
      "gzip members" -> gz,
      "gzip + trailing junk" -> cat(gz, "trailing junk\r\n".getBytes(UTF_8)),
      "gzip cut trailer" -> java.util.Arrays.copyOfRange(gz, 0, gz.length - 6),
      "gzip cut mid-member" -> java.util.Arrays.copyOfRange(gz, 0, gz.length / 2),
      "gzip magic only" -> Array(0x1f.toByte, 0x8b.toByte),
      "all garbage" -> "not a warc at all, nothing to see".getBytes(UTF_8))
    fixtures.foreach { case (label, bytes) => assertSame(bytes, label) }
  }

  test("L50 member-wise: randomized corruption differential (seeded) — streaming ≡ buffered under truncation, byte flips, garbage splices") {
    val rnd = new scala.util.Random(42)
    def mkContainer(): Array[Byte] = {
      val recs = (0 until 1 + rnd.nextInt(4)).map { i =>
        val t = Seq("conversion", "response", "warcinfo")(rnd.nextInt(3))
        val body = (0 until rnd.nextInt(80)).map(_ =>
          (32 + rnd.nextInt(95)).toChar).mkString +
          (if (rnd.nextBoolean()) "\r\nWARC/1.0\r\n" else "")
        Warc.writeRecord(t, s"http://r.example.com/$i",
          if (t == "response") "application/http; msgtype=response" else "text/plain",
          body.getBytes(UTF_8))
      }
      val plain = recs.reduce(_ ++ _)
      if (rnd.nextBoolean())
        Warc.buildWet(recs.indices.map(i =>
          (s"http://z.example.com/$i", s"text $i")), gzip = true)
      else plain
    }
    (0 until 200).foreach { trial =>
      val base = mkContainer()
      val mutated = rnd.nextInt(4) match {
        case 0 => // truncate
          java.util.Arrays.copyOfRange(base, 0, rnd.nextInt(base.length + 1))
        case 1 => // flip one byte
          val b = base.clone()
          val at = rnd.nextInt(b.length)
          b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte; b
        case 2 => // splice garbage at a random offset
          val at = rnd.nextInt(base.length + 1)
          val g = new Array[Byte](1 + rnd.nextInt(24)); rnd.nextBytes(g)
          java.util.Arrays.copyOfRange(base, 0, at) ++ g ++
            java.util.Arrays.copyOfRange(base, at, base.length)
        case _ => base ++ mkContainer() // concatenated containers
      }
      assertSame(mutated, s"trial $trial")
    }
  }

  test("L50 member-wise: carry stays at record grain on a container whose inflated size dwarfs it (the old whole-container inflation buffer is gone)") {
    // 128 records of ~64 KB each → ~8 MB inflated; the old gunzipAll
    // path materialized all of it contiguously before parsing
    val body = ("the quick brown fox jumps over the lazy dog " * 1456).trim // ~64 KB
    val pages = (0 until 128).map(i => (f"http://big.example.com/$i%03d", s"$body $i"))
    val gz = Warc.buildWet(pages, gzip = true)
    val inflatedTotal = pages.map(_._2.length + 160).sum // bodies + headers
    val members = new Warc.GzipMembers(gz)
    val sc = new Warc.RecordScanner
    var n = 0
    var maxMember = 0
    while (members.hasNext) {
      val m = members.next()
      maxMember = math.max(maxMember, m.length)
      n += sc.feed(m).size // records discarded: pure working-memory probe
    }
    n += sc.finish().size
    assert(n === 128 && sc.malformed === 0 && !members.truncated)
    // the carry never exceeds one member (= one record, the CommonCrawl
    // layout) plus the scanner's boundary look-around
    assert(sc.maxCarry <= maxMember + 64,
      s"carry ${sc.maxCarry} must stay at record grain (member $maxMember)")
    assert(sc.maxCarry < inflatedTotal / 50,
      s"carry ${sc.maxCarry} must be far below the ${inflatedTotal}B the old inflation buffer held")
    assertSame(gz, "big container")
  }

  test("L50: a crafted Content-Length near Long.MaxValue is ONE malformed unit, never an overflow-accepted record (ADVICE r17)") {
    // pre-fix, `p + len > n` wrapped negative, the terminator probe at
    // p + len.toInt = p - 4 landed on the header's own CRLFCRLF, and
    // copyOfRange(bytes, p, p - 4) threw — killing the task on one
    // adversarial record in untrusted crawl data
    val evil = ("WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "Content-Length: 9223372036854775804\r\n\r\n").getBytes(UTF_8)
    val good = Warc.writeRecord("conversion", "http://ok.example.com/1",
      "text/plain", "still here".getBytes(UTF_8))
    val (rs, bad) = Warc.parseAll(evil ++ good)
    assert(bad === 1 && rs.size === 1, s"got ${rs.size}/$bad")
    assert(Warc.payloadText(rs.head) === "still here")
    assertSame(evil ++ good, "crafted Content-Length")
    assertSame(evil, "crafted Content-Length alone")
  }

  test("L50 member-wise: exotic gzip member headers (FEXTRA/FNAME/FCOMMENT/FHCRC) parse like the JDK reader") {
    val rec = Warc.writeRecord("conversion", "http://e.example.com/1",
      "text/plain", "exotic".getBytes(UTF_8))
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(rec); d.finish()
    val dbuf = new Array[Byte](rec.length * 2 + 64)
    val dlen = d.deflate(dbuf)
    assert(d.finished()); d.end()
    def u16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32(v: Long) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val head = Array[Byte](0x1f.toByte, 0x8b.toByte, 8,
      (2 | 4 | 8 | 16).toByte, 0, 0, 0, 0, 0, 0xff.toByte) ++
      u16(3) ++ Array[Byte](9, 9, 9) ++ // FEXTRA
      ("name".getBytes(UTF_8) :+ 0.toByte) ++ // FNAME
      ("comment".getBytes(UTF_8) :+ 0.toByte) // FCOMMENT
    val hcrc = new java.util.zip.CRC32; hcrc.update(head)
    val bodyCrc = new java.util.zip.CRC32; bodyCrc.update(rec)
    val container = head ++ u16((hcrc.getValue & 0xffff).toInt) ++
      dbuf.take(dlen) ++ u32(bodyCrc.getValue) ++ u32(rec.length.toLong)
    val (rs, bad) = Warc.parseAll(container)
    assert(bad === 0 && rs.size === 1)
    assert(Warc.payloadText(rs.head) === "exotic")
    assertSame(container, "exotic gzip header")
    // a corrupted header CRC16 must reject the member like the JDK does
    val broken = container.clone()
    broken(head.length) = (broken(head.length) ^ 0x55).toByte
    assertSame(broken, "broken FHCRC")
  }

  test("L50: packWet gzipOdd covers every integral bucket type — a short or decimal bucket must not silently degrade to all-plain output (ADVICE r17)") {
    def isGz(b: Array[Byte]) = (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b
    val shorts = Seq((1.toShort, "http://s.example.com/1", "alpha"),
      (2.toShort, "http://s.example.com/2", "beta"))
      .toDF("bucket", "url", "text")
    val outS = Warc.packWet(shorts, "bucket", "url", "text", gzipOdd = true)
      .collect().map(r => (r.getShort(0), r.getAs[Array[Byte]](1))).toMap
    assert(isGz(outS(1.toShort)), "odd short bucket must gzip")
    assert(!isGz(outS(2.toShort)), "even short bucket must stay plain")
    val decs = Seq((BigDecimal(3), "http://d.example.com/3", "gamma"),
      (BigDecimal(4), "http://d.example.com/4", "delta"))
      .toDF("bucket", "url", "text")
    val outD = Warc.packWet(decs, "bucket", "url", "text", gzipOdd = true)
      .collect().map(r => (r.getDecimal(0).longValue, r.getAs[Array[Byte]](1))).toMap
    assert(isGz(outD(3L)), "odd decimal bucket must gzip")
    assert(!isGz(outD(4L)), "even decimal bucket must stay plain")
    // both forms parse back to their pages either way
    val (ra, ba) = Warc.parseAll(outS(1.toShort))
    val (rb, bb) = Warc.parseAll(outD(4L))
    assert(ba === 0 && bb === 0 &&
      ra.map(Warc.payloadText) === Seq("alpha") &&
      rb.map(Warc.payloadText) === Seq("delta"))
  }

  test("L50: chunked HTTP transfer bodies decode (RFC 9112 §7.1); malformed chunk framing falls back to the raw body") {
    def respRec(headers: String, body: String) = Warc.writeRecord(
      "response", "http://ch.example.com/1",
      "application/http; msgtype=response",
      (s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n" + body).getBytes(UTF_8))
    def payloadOf(rec: Array[Byte]): String = {
      val (rs, bad) = Warc.parseAll(rec)
      assert(bad === 0 && rs.size === 1)
      Warc.payloadText(rs.head)
    }
    val te = "Content-Type: text/html\r\nTransfer-Encoding: chunked"
    // three chunks reassemble
    assert(payloadOf(respRec(te,
      "5\r\nhello\r\n8\r\n, chunke\r\n7\r\nd world\r\n0\r\n\r\n")) ===
      "hello, chunked world")
    // chunk extensions ignored; trailer headers ignored; CRLF inside
    // chunk DATA is payload, not framing
    assert(payloadOf(respRec(te,
      "c;ext=1\r\nab\r\ncdefghij\r\n0\r\nX-Trail: v\r\n\r\n")) ===
      "ab\r\ncdefghij")
    // header name/value match is case-insensitive
    assert(payloadOf(respRec(
      "transfer-encoding: Chunked", "3\r\nxyz\r\n0\r\n\r\n")) === "xyz")
    // malformed framings fall back to the raw body verbatim
    for (bad <- Seq(
      "ZZ\r\nhello\r\n0\r\n\r\n",         // non-hex size
      "5\r\nhello",                       // missing chunk CRLF
      "ff\r\nshort\r\n0\r\n\r\n",         // size past the body
      "5\r\nhelloXY6\r\n0\r\n\r\n"))      // data not CRLF-terminated
      assert(payloadOf(respRec(te, bad)) === bad,
        s"must fall back verbatim: $bad")
    // identity bodies (no Transfer-Encoding) are untouched — the
    // CommonCrawl default path
    assert(payloadOf(respRec("Content-Type: text/html",
      "5\r\nhello\r\n0\r\n\r\n")) === "5\r\nhello\r\n0\r\n\r\n")
  }

  test("L50: Content-Encoding gzip/deflate response bodies decode (RFC 9110 §8.4); chunked+gzip stack in wire order; malformed or unknown codings fall back verbatim") {
    def respRecB(headers: String, body: Array[Byte]) = Warc.writeRecord(
      "response", "http://ce.example.com/1",
      "application/http; msgtype=response",
      s"HTTP/1.1 200 OK\r\n$headers\r\n\r\n".getBytes(UTF_8) ++ body)
    def payloadOf(rec: Array[Byte]): String = {
      val (rs, bad) = Warc.parseAll(rec)
      assert(bad === 0 && rs.size === 1)
      Warc.payloadText(rs.head)
    }
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes(UTF_8)); g.close(); bo.toByteArray
    }
    def defl(s: String, nowrap: Boolean): Array[Byte] = {
      val d = new java.util.zip.Deflater(
        java.util.zip.Deflater.DEFAULT_COMPRESSION, nowrap)
      d.setInput(s.getBytes(UTF_8)); d.finish()
      val bo = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!d.finished()) bo.write(buf, 0, d.deflate(buf))
      d.end(); bo.toByteArray
    }
    val ct = "Content-Type: text/html"
    // gzip + the x-gzip alias, value match case-insensitive
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: gzip",
      gz("<p>gzipped page</p>"))) === "<p>gzipped page</p>")
    assert(payloadOf(respRecB(s"$ct\r\ncontent-encoding: X-GZIP",
      gz("aliased"))) === "aliased")
    // deflate: the zlib wrapping the RFC means AND the bare stream
    // misconfigured servers send
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: deflate",
      defl("zlib-wrapped body", nowrap = false))) === "zlib-wrapped body")
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: deflate",
      defl("raw deflate body", nowrap = true))) === "raw deflate body")
    // chunked + gzip stacked: transfer de-framing first, then the
    // content coding — the wire's layer order
    val gzBytes = gz("stacked codings")
    val chunkedGz = s"${gzBytes.length.toHexString}\r\n".getBytes(UTF_8) ++
      gzBytes ++ "\r\n0\r\n\r\n".getBytes(UTF_8)
    assert(payloadOf(respRecB(
      s"$ct\r\nTransfer-Encoding: chunked\r\nContent-Encoding: gzip",
      chunkedGz)) === "stacked codings")
    // malformed codings fall back to the body verbatim (S16 posture)
    val truncated = gz("will be cut").dropRight(6)
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: gzip", truncated))
      === new String(truncated, UTF_8))
    val notGzip = "plain text, headers lied".getBytes(UTF_8)
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: gzip", notGzip))
      === "plain text, headers lied")
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: deflate", notGzip))
      === "plain text, headers lied")
    // codings this engine has no codec for (and coding lists) ride
    // through verbatim rather than throwing
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: br", notGzip))
      === "plain text, headers lied")
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: gzip, br",
      gz("listed"))) === new String(gz("listed"), UTF_8))
    // identity is the explicit spelling of the default path
    assert(payloadOf(respRecB(s"$ct\r\nContent-Encoding: identity",
      "just text".getBytes(UTF_8))) === "just text")
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
