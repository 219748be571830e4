package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling (SURVEY §2.9 L8): image/audio/video payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run per-partition so batches amortize codec setup.
  *
  * Feature extraction is CONTENT-DERIVED for two honest container
  * formats parsed here from scratch — binary PPM images (`P6`, the
  * classic uncompressed RGB container) and 16-bit PCM WAV audio
  * (RIFF/WAVE) — covering one image and one audio modality end-to-end:
  * header fields and per-channel pixel/sample statistics come from real
  * decoding, and a changed payload provably changes the features
  * (oracle-checked in `l08b_ppm_decode`). Payloads in any OTHER format
  * fall back to `decodeStub` (deterministic bytes-hash fake), clearly
  * quarantined — swap it for a JNI/codec call in production for
  * compressed formats (those codecs aren't in this container).
  *
  * Scale notes: payloads never pass through a shuffle here (narrow
  * mapPartitions); at 100 TB keep payloads in their own column family
  * (parquet column) so metadata-only queries never read the blob pages —
  * Spark's parquet column pruning gives that for free.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("byte_len", LongType),
    StructField("format", StringType)))

  /** Wrap a source column as a multimodal envelope:
    * (payload binary, meta struct). */
  def toEnvelope(df: DataFrame, srcCol: String, modality: String, format: String): DataFrame =
    df.withColumn("payload", col(srcCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit(modality).alias("modality"),
        length(col(srcCol).cast(BinaryType)).cast(LongType).alias("byte_len"),
        lit(format).alias("format")))

  /** STUB decode: deterministic fake "feature vector" from payload bytes
    * (first 8 bytes folded). The quarantined fallback for formats whose
    * codecs aren't in this container (JPEG/MP3/...). */
  private def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val seed = payload.take(8).foldLeft(1469598103934665603L)((h, b) => (h ^ b) * 1099511628211L)
    Array.tabulate(dim) { i =>
      val x = seed * (i + 1) + 0x9e3779b97f4a7c15L * i
      ((x >>> 11).toDouble / (1L << 53).toDouble).toFloat - 0.5f
    }
  }

  private[graft] final case class PpmImage(
      width: Int, height: Int, maxVal: Int, pixels: Array[Byte])

  /** Honest binary-PPM (`P6`) decoder, written from the public netpbm
    * format spec: `P6 <ws> width <ws> height <ws> maxval <single-ws> raw
    * RGB triplets`, `#` comments allowed in the header. Returns None for
    * anything that isn't a complete well-formed P6 image. */
  private[graft] def decodePpm(bytes: Array[Byte]): Option[PpmImage] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs(); var v = 0L; var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        // stop accumulating once past the bound (a longer digit run can't
        // come back under it) so a pathological run can't overflow Long
        if (v <= 100000000L) v = v * 10 + (bytes(i) - '0')
        i += 1; any = true
      }
      // a dimension past 1e8 can't be a real 8-bit PPM — reject instead
      // of letting Int wrap to a small positive width/height that might
      // coincide with the raster length and mis-parse
      if (!any || v > 100000000L) -1 else v.toInt
    }
    val w = int(); val h = int(); val mv = int()
    // 8-bit-per-sample only (maxval <= 255); the 16-bit variant is rare
    if (w <= 0 || h <= 0 || mv <= 0 || mv > 255 || i >= bytes.length) return None
    // exactly one whitespace byte separates maxval from the raster — a
    // non-whitespace byte here is malformed, and skipping it blindly
    // would mis-align the whole raster by one byte
    bytes(i) match {
      case ' ' | '\n' | '\r' | '\t' => i += 1
      case _ => return None
    }
    val need = w.toLong * h * 3
    if (need > Int.MaxValue || bytes.length - i < need) None
    else Some(PpmImage(w, h, mv, java.util.Arrays.copyOfRange(bytes, i, i + need.toInt)))
  }

  private[graft] final case class WavAudio(
      channels: Int, sampleRate: Int, samples: Array[Short])

  /** Honest 16-bit-PCM WAV decoder, written from the public RIFF/WAVE
    * spec: `RIFF <size> WAVE` then word-aligned chunks; `fmt ` carries
    * (audioFormat=1, channels, sampleRate, ..., bitsPerSample=16),
    * `data` carries little-endian samples. None for anything else. */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[WavAudio] = {
    def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (bytes.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    var i = 12
    var fmt = -1; var channels = -1; var rate = -1; var bps = -1
    var data: Array[Byte] = null
    while (i + 8 <= bytes.length) {
      val id = tag(i); val sz = u32(i + 4)
      val body = i + 8
      if (id == "fmt " && sz >= 16 && body + 16 <= bytes.length) {
        fmt = u16(body); channels = u16(body + 2)
        rate = u32(body + 4).toInt; bps = u16(body + 14)
      } else if (id == "data") {
        // a declared size past EOF is a truncated file — reject rather
        // than silently computing moments over half the audio
        if (body + sz > bytes.length) return None
        data = java.util.Arrays.copyOfRange(bytes, body, (body + sz).toInt)
      }
      i = body + sz.toInt + (sz.toInt & 1) // chunks are word-aligned
      if (sz < 0 || sz > bytes.length) return None // corrupt size field
    }
    if (fmt != 1 || bps != 16 || channels < 1 || rate <= 0 || data == null) None
    else {
      val n = data.length / 2
      val samples = new Array[Short](n)
      var j = 0
      while (j < n) {
        samples(j) = ((data(2 * j) & 0xff) | (data(2 * j + 1) << 8)).toShort
        j += 1
      }
      Some(WavAudio(channels, rate, samples))
    }
  }

  /** Content-derived features. Layout (padded/truncated to `dim`):
    *  - PPM:  [1, width, height, maxval, meanR, meanG, meanB, meanAll]
    *  - WAV:  [2, channels, sampleRate, nSamples, mean, rms, min, max]
    *  - else: decodeStub (format tag 0 territory — quarantined fake)
    * Sums accumulate exactly in Long; the final double divisions (and
    * sqrt) are single IEEE ops, so an external engine recomputing the
    * same formula gets bit-identical REALs (the l08b oracle does). */
  private[graft] def contentFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    val full: Array[Float] = decodePpm(payload).map { im =>
      val px = im.pixels
      var sr = 0L; var sg = 0L; var sb = 0L
      var j = 0
      while (j < px.length) {
        val v = px(j) & 0xff
        (j % 3: @annotation.switch) match {
          case 0 => sr += v; case 1 => sg += v; case _ => sb += v
        }
        j += 1
      }
      val npx = (px.length / 3).toDouble
      Array(1f, im.width.toFloat, im.height.toFloat, im.maxVal.toFloat,
        (sr / npx).toFloat, (sg / npx).toFloat, (sb / npx).toFloat,
        ((sr + sg + sb) / (npx * 3)).toFloat)
    }.orElse(decodeWav(payload).map { a =>
      var sum = 0L; var sq = 0.0; var mn = Int.MaxValue; var mx = Int.MinValue
      a.samples.foreach { s0 =>
        val v = s0.toInt
        sum += v; sq += v.toDouble * v
        if (v < mn) mn = v; if (v > mx) mx = v
      }
      val n = math.max(a.samples.length, 1).toDouble
      Array(2f, a.channels.toFloat, a.sampleRate.toFloat, a.samples.length.toFloat,
        (sum / n).toFloat, math.sqrt(sq / n).toFloat,
        (if (mn == Int.MaxValue) 0 else mn).toFloat,
        (if (mx == Int.MinValue) 0 else mx).toFloat)
    }).getOrElse(decodeStub(payload, dim))
    if (full.length == dim) full
    else java.util.Arrays.copyOf(full, dim) // pad 0f / truncate
  }

  /** Per-partition decode+featurize: adds `features array<float>`
    * ([[contentFeatures]] — real PPM/WAV parsing, stub fallback for
    * unrecognized formats). mapPartitions (not per-row UDF) so a codec
    * for compressed formats could init once per partition; output schema
    * is explicit for downstream pruning. */
  def extractFeatures(df: DataFrame, dim: Int = 8): DataFrame = {
    val outSchema = df.schema.add(StructField("features", ArrayType(FloatType)))
    val enc = RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val feats = if (payload == null) null else contentFeatures(payload, dim)
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Deterministic P6 test-pattern generator (the multimodal analogue of
    * the planted-fixture builders elsewhere): per row, a real `width` ×
    * `height` PPM whose pixel bytes are `(seed * 7 + j) % 251` — so an
    * external engine can recompute the expected decoded statistics from
    * the seed alone (the `l08b_ppm_decode` oracle does exactly that),
    * and two different seeds provably produce different features. */
  def syntheticPpm(df: DataFrame, seedCol: String, width: Int, height: Int): DataFrame = {
    require(width >= 1 && height >= 1, "syntheticPpm needs positive dims")
    val outSchema = df.schema.add(StructField("payload", BinaryType))
    val enc = RowEncoder.encoderFor(outSchema)
    val seedIdx = df.schema.fieldIndex(seedCol)
    val header = s"P6\n$width $height\n255\n".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val n = width * height * 3
    df.mapPartitions { rows =>
      rows.map { r =>
        val seed = r.getLong(seedIdx)
        val out = new Array[Byte](header.length + n)
        System.arraycopy(header, 0, out, 0, header.length)
        var j = 0
        while (j < n) {
          out(header.length + j) = (((seed * 7 + j) % 251 + 251) % 251).toByte
          j += 1
        }
        Row.fromSeq(r.toSeq :+ out)
      }
    }(enc)
  }

  /** Resize stub: truncate the payload to `targetBytes` and update the
    * metadata — the byte-level shape of an image downscale (real codec
    * absent from this container; the schema and per-row transform are
    * the production plumbing). */
  def resize(df: DataFrame, targetBytes: Int): DataFrame =
    df.withColumn("payload", substring(col("payload"), 1, targetBytes))
      .withColumn("meta", struct(
        col("meta.modality").alias("modality"),
        length(col("payload")).cast(LongType).alias("byte_len"),
        col("meta.format").alias("format")))

  /** Frame-sample stub: emit every `stride`-th "frame" index with a
    * per-frame fingerprint — the 1→N explode shape of video sampling. */
  def frameSample(df: DataFrame, nFrames: Int, stride: Int): DataFrame = {
    // sequence(0, (n-1)*stride, stride) throws at RUNTIME on the first
    // row for nFrames=0 (stop below start) or stride=0 (zero step) —
    // fail at the call site instead
    require(nFrames >= 1, "frameSample needs nFrames >= 1")
    require(stride >= 1, "frameSample needs stride >= 1")
    df.withColumn("frame_idx",
        explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))))
      .withColumn("frame_fp",
        abs(hash(col("payload"), col("frame_idx")).cast(LongType)))
  }
}
