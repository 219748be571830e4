package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** WARC/WET container intake (ISO 28500 — the CommonCrawl record
  * grammar every public pretraining pipeline starts from: CCNet,
  * RefinedWeb and Dolma all read WARC response records or their WET
  * text conversions; the engine previously started at an `html`
  * column). Reference behavior analogue: the reference's source
  * connectors poll container-framed records off external systems
  * (`main.sh:38-58`); this is the corresponding container-to-rows
  * front for crawl archives.
  *
  * Record grammar parsed from scratch (the [[graft.operators.Multimodal]]
  * binary-decoder discipline): a version line `WARC/x.y` CRLF, header
  * lines `Name: value` CRLF (continuation lines folded per the spec),
  * an empty line, then a `Content-Length`-delimited octet block,
  * then CRLF CRLF. Containers may be gzip'd — CommonCrawl writes ONE
  * GZIP MEMBER PER RECORD so readers can split on member boundaries;
  * the JDK inflater consumes concatenated members transparently, so
  * one decompression pass yields the same record stream (the PNG path
  * already rides the same zlib).
  *
  * Malformed-record tolerance (the S16 convention): a record that
  * violates the grammar — bad version line, unparseable or missing
  * Content-Length, a block running past the container, a missing
  * record terminator — is COUNTED and skipped by scanning to the next
  * `\r\nWARC/` boundary; everything before and after still parses.
  * A container whose gzip stream is corrupt beyond the first good
  * members yields the records already decompressed plus one malformed
  * count.
  *
  * Scale shape: one container row = one WARC chunk (CommonCrawl ships
  * ~1 GB files; re-chunk upstream to executor-memory-sized pieces).
  * Parsing is pure per-row imperative byte work via `mapPartitions`
  * (the genuine per-partition-imperative tier — there is no
  * declarative form of a byte-grammar walk), embarrassingly parallel,
  * no shuffle; the records explode in place and downstream legs
  * (L43 URL dedup → L21 strip/clean → the gate chain) consume the
  * (url, html) rows exactly as before.
  */
object Warc {

  /** One parsed record: WARC-Type, target URI (angle brackets
    * stripped), Content-Type, the declared block length, and the raw
    * block octets. */
  final case class Record(warcType: String, targetUri: String,
      contentType: String, contentLength: Long, block: Array[Byte])

  private val Magic = "WARC/".getBytes(UTF_8)

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress every gzip member (CommonCrawl: one per record),
    * tolerating a corrupt tail: returns the bytes that did inflate
    * plus whether the stream died early (counted as one malformed
    * record by [[parseAll]]). */
  private[sources] def gunzipAll(bytes: Array[Byte]): (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    try {
      val in = new java.util.zip.GZIPInputStream(
        new ByteArrayInputStream(bytes), 64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      (out.toByteArray, false)
    } catch {
      case _: java.io.IOException => (out.toByteArray, true)
    }
  }

  /** Parse every record of one (possibly gzip'd) container; returns
    * (records, malformedCount). Never throws on content. */
  def parseAll(container: Array[Byte]): (Seq[Record], Int) = {
    if (container == null) return (Nil, 0)
    val (bytes, gzTruncated) = if (isGzip(container))
      gunzipAll(container) else (container, false)
    val recs = Seq.newBuilder[Record]
    var malformed = if (gzTruncated) 1 else 0
    val n = bytes.length

    def startsWith(at: Int, pat: Array[Byte]): Boolean =
      at + pat.length <= n && {
        var j = 0
        while (j < pat.length && bytes(at + j) == pat(j)) j += 1
        j == pat.length
      }
    /** Index just past the next CRLF at/after `from`, or -1. */
    def lineEnd(from: Int): Int = {
      var i = from
      while (i + 1 < n && !(bytes(i) == '\r' && bytes(i + 1) == '\n')) i += 1
      if (i + 1 < n) i + 2 else -1
    }
    /** Next record boundary strictly after `from`: a `\r\nWARC/`, or
      * end-of-stream. */
    def nextBoundary(from: Int): Int = {
      var i = from
      while (i < n && !((i == 0 || (bytes(i - 1) == '\n' &&
        i >= 2 && bytes(i - 2) == '\r')) && startsWith(i, Magic))) i += 1
      i
    }

    var i = 0
    // leading garbage before the first record is one malformed unit
    if (n > 0 && !startsWith(i, Magic)) { malformed += 1; i = nextBoundary(i + 1) }
    while (i < n) {
      var bad = false
      var headers = Map.empty[String, String]
      var lastKey: String = null
      var p = lineEnd(i) // past the WARC/x.y version line
      if (p < 0 || !startsWith(i, Magic)) bad = true
      // header lines until the empty CRLF line
      var open = !bad
      while (open) {
        if (p + 1 < n && bytes(p) == '\r' && bytes(p + 1) == '\n') {
          p += 2; open = false // blank line: block follows
        } else {
          val e = lineEnd(p)
          if (e < 0) { bad = true; open = false }
          else {
            val line = new String(bytes, p, e - 2 - p, UTF_8)
            if ((line.startsWith(" ") || line.startsWith("\t")) &&
                lastKey != null) // spec line folding
              headers += lastKey -> (headers(lastKey) + " " + line.trim)
            else line.indexOf(':') match {
              case -1 => bad = true; open = false
              case c =>
                lastKey = line.substring(0, c).trim.toLowerCase
                headers += lastKey -> line.substring(c + 1).trim
            }
            p = e
          }
        }
      }
      val len = headers.get("content-length").flatMap(v =>
        scala.util.Try(v.toLong).toOption).getOrElse(-1L)
      if (!bad && (len < 0 || p + len > n)) bad = true
      // the record terminator: CRLF CRLF after the block
      if (!bad) {
        val t = p + len.toInt
        if (!(t + 4 <= n && bytes(t) == '\r' && bytes(t + 1) == '\n' &&
            bytes(t + 2) == '\r' && bytes(t + 3) == '\n') &&
          t != n) bad = true // EOF right at block end is tolerated
      }
      if (bad) { malformed += 1; i = nextBoundary(i + 1) }
      else {
        val uri = headers.getOrElse("warc-target-uri", "")
        recs += Record(
          headers.getOrElse("warc-type", ""),
          if (uri.length >= 2 && uri.head == '<' && uri.last == '>')
            uri.substring(1, uri.length - 1) else uri,
          headers.getOrElse("content-type", ""),
          len,
          java.util.Arrays.copyOfRange(bytes, p, p + len.toInt))
        i = (p + len.toInt + 4) min n
        // inter-record garbage: skip to the next boundary, counted
        if (i < n && !startsWith(i, Magic)) {
          malformed += 1
          i = nextBoundary(i)
        }
      }
    }
    (recs.result(), malformed)
  }

  /** Page payload of a record as text: `application/http` blocks strip
    * the HTTP status line + headers (body after the first CRLF CRLF —
    * chunked transfer encoding is out of scope, CommonCrawl stores
    * identity bodies); anything else (WET `text/plain` conversions)
    * is the block verbatim. */
  def payloadText(r: Record): String = {
    val b = r.block
    if (r.contentType.startsWith("application/http")) {
      var i = 0
      while (i + 3 < b.length && !(b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n')) i += 1
      if (i + 3 < b.length) new String(b, i + 4, b.length - i - 4, UTF_8)
      else ""
    } else new String(b, UTF_8)
  }

  /** Explode a container column into page rows `(url, page_text,
    * warc_type, content_type, content_length, malformed)` appended to
    * the carried columns — `malformed` is the container's skipped
    * count stamped on each of its rows (a fully-bad container yields
    * ONE all-NULL row carrying the count, the S16 quarantine-visible
    * convention). Only `response` and `conversion` records become
    * rows (warcinfo/request/metadata records are framing). */
  def pages(df: DataFrame, binCol: String): DataFrame = {
    val carried = df.schema.fields.filter(_.name != binCol)
    val outSchema = StructType(carried ++ Seq(
      StructField("url", StringType), StructField("page_text", StringType),
      StructField("warc_type", StringType),
      StructField("content_type", StringType),
      StructField("content_length", LongType),
      StructField("malformed", IntegerType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    val binIdx = df.schema.fieldIndex(binCol)
    val carriedIdx = carried.map(f => df.schema.fieldIndex(f.name))
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val base = carriedIdx.map(r.get).toSeq
        val (recs, malformed) = parseAll(r.getAs[Array[Byte]](binIdx))
        val pages = recs.filter(x =>
          x.warcType == "response" || x.warcType == "conversion")
        if (pages.isEmpty && malformed > 0)
          Iterator.single(Row.fromSeq(base ++
            Seq(null, null, null, null, null, malformed)))
        else pages.iterator.map(x => Row.fromSeq(base ++ Seq(
          x.targetUri, payloadText(x), x.warcType, x.contentType,
          x.contentLength, malformed)))
      }
    }(enc)
  }

  // ---- deterministic writers (fixtures + the l45 oracle row) ----

  /** Serialize one record (the writer half used by fixtures and by
    * tests; CRLF grammar exactly as parsed above). */
  def writeRecord(warcType: String, targetUri: String, contentType: String,
      body: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0\r\n")
    h ++= s"WARC-Type: $warcType\r\n"
    if (targetUri.nonEmpty) h ++= s"WARC-Target-URI: $targetUri\r\n"
    h ++= s"Content-Type: $contentType\r\n"
    h ++= s"Content-Length: ${body.length}\r\n\r\n"
    val head = h.result().getBytes(UTF_8)
    val out = new Array[Byte](head.length + body.length + 4)
    System.arraycopy(head, 0, out, 0, head.length)
    System.arraycopy(body, 0, out, head.length, body.length)
    out(out.length - 4) = '\r'; out(out.length - 3) = '\n'
    out(out.length - 2) = '\r'; out(out.length - 1) = '\n'
    out
  }

  /** Pack page rows into per-bucket WET containers — the writer half
    * of the source (a WET sink analogue, and the l45 fixture): one
    * `conversion` record per (url, text) row, rows within a bucket in
    * url order (deterministic bytes), one container row per bucket;
    * odd buckets optionally gzip (one member per record, the
    * CommonCrawl layout) so both container forms stay exercised.
    * Output schema: (bucketCol, warc binary). Scale: one groupBy on
    * the bucket key, container size = the caller's bucketing choice. */
  def packWet(df: DataFrame, bucketCol: String, urlCol: String,
      textCol: String, gzipOdd: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions._
    val grouped = df
      .groupBy(col(bucketCol))
      .agg(sort_array(collect_list(struct(col(urlCol), col(textCol))))
        .as("__recs"))
    val outSchema = StructType(Seq(
      grouped.schema.fields.head.copy(),
      StructField("warc", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    grouped.mapPartitions { rows =>
      rows.map { r =>
        val bucket = r.get(0)
        val recs = r.getSeq[Row](1).map(x => (x.getString(0), x.getString(1)))
        val gz = gzipOdd && (bucket match {
          case l: java.lang.Long => l % 2 != 0
          case i: java.lang.Integer => i % 2 != 0
          case _ => false
        })
        Row(bucket, buildWet(recs, gz))
      }
    }(enc)
  }

  /** A WET-style container: one `conversion` (text/plain) record per
    * (url, text) pair, optionally one gzip member per record (the
    * CommonCrawl layout). */
  def buildWet(pages: Seq[(String, String)], gzip: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    pages.foreach { case (url, text) =>
      val rec = writeRecord("conversion", url, "text/plain",
        text.getBytes(UTF_8))
      if (gzip) {
        val gz = new java.util.zip.GZIPOutputStream(out)
        gz.write(rec); gz.finish()
      } else out.write(rec)
    }
    out.toByteArray
  }
}
