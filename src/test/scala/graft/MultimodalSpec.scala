package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** L8 decoders: the from-scratch PPM (P6) and 16-bit-PCM WAV parsers are
  * honest — header fields and statistics come from real decoding, planted
  * payload changes change the features, and malformed input falls back to
  * the (quarantined) stub instead of mis-decoding. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def ppm(w: Int, h: Int, px: Array[Int], header: String = null): Array[Byte] = {
    val head = Option(header).getOrElse(s"P6\n$w $h\n255\n")
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    head ++ px.map(_.toByte)
  }

  test("decodePpm: parses dims/maxval incl. comments, rejects truncation and wrong magic") {
    val img = Multimodal.decodePpm(ppm(2, 1, Array(10, 20, 30, 40, 50, 60))).get
    assert(img.width == 2 && img.height == 1 && img.maxVal == 255)
    assert(img.pixels.map(_ & 0xff).toSeq == Seq(10, 20, 30, 40, 50, 60))
    // header comments are part of the spec
    val commented = ppm(1, 1, Array(1, 2, 3), header = "P6\n# a comment\n1 1\n# more\n255\n")
    assert(Multimodal.decodePpm(commented).exists(_.width == 1))
    // truncated raster / wrong magic / absurd maxval → None, not garbage
    assert(Multimodal.decodePpm(ppm(2, 2, Array(1, 2, 3))).isEmpty)
    assert(Multimodal.decodePpm("P5\n1 1\n255\nxxx".getBytes).isEmpty)
    assert(Multimodal.decodePpm("P6\n1 1\n65535\nabc".getBytes).isEmpty)
    // non-whitespace separator after maxval: malformed, NOT a one-byte
    // raster misalignment
    assert(Multimodal.decodePpm("P6\n1 1\n255Xabc".getBytes).isEmpty)
    // a digit run that would wrap Int (e.g. 2^32+3 ≡ 3) must be rejected,
    // not mis-parsed as a small positive width whose raster length
    // happens to line up
    assert(Multimodal.decodePpm("P6\n4294967299 1\n255\nabcdefghi".getBytes).isEmpty)
    assert(Multimodal.decodePpm(("P6\n" + "9" * 40 + " 1\n255\nabc").getBytes).isEmpty)
  }

  private def wav(channels: Int, rate: Int, samples: Array[Short],
      audioFormat: Int = 1, bps: Int = 16): Array[Byte] = {
    val data = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      data(2 * i) = (s & 0xff).toByte; data(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = le16(audioFormat) ++ le16(channels) ++ le32(rate) ++
      le32(rate * channels * bps / 8) ++ le16(channels * bps / 8) ++ le16(bps)
    "RIFF".getBytes ++ le32(4 + 8 + fmt.length + 8 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  test("decodeWav: parses PCM16 samples exactly, rejects non-PCM and non-RIFF") {
    val samples = Array[Short](0, 1000, -1000, Short.MaxValue, Short.MinValue)
    val a = Multimodal.decodeWav(wav(2, 44100, samples)).get
    assert(a.channels == 2 && a.sampleRate == 44100)
    assert(a.samples.toSeq == samples.toSeq)
    assert(Multimodal.decodeWav(wav(1, 8000, samples, audioFormat = 3)).isEmpty) // float PCM
    assert(Multimodal.decodeWav(wav(1, 8000, samples, bps = 8)).isEmpty)
    assert(Multimodal.decodeWav("JUNKdata".getBytes).isEmpty)
    // data chunk whose declared size runs past EOF = truncated file →
    // rejected, not half-decoded
    val whole = wav(1, 8000, samples)
    assert(Multimodal.decodeWav(whole.dropRight(3)).isEmpty)
  }

  test("extractFeatures is content-derived: PPM stats match hand-computed, payload change changes features") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val imgs = Multimodal.syntheticPpm(df, "id", width = 4, height = 3)
    val feats = Multimodal.extractFeatures(imgs, dim = 8)
      .select($"id", $"features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // seed 1: pixel j = (7 + j) % 251; channel means computed directly
    def mean(seed: Long, ch: Int): Float =
      ((0 until 36).filter(_ % 3 == ch).map(j => (seed * 7 + j) % 251).sum / 12.0).toFloat
    assert(feats(1L).take(4) == Seq(1f, 4f, 3f, 255f))
    assert(feats(1L)(4) == mean(1L, 0) && feats(1L)(5) == mean(1L, 1) && feats(1L)(6) == mean(1L, 2))
    // different payloads → different features (the not-a-stub proof)
    assert(feats(1L) != feats(2L))
    assert(feats(2L)(4) == mean(2L, 0))
  }

  test("extractFeatures on WAV: moments match hand-computed values") {
    val samples = Array[Short](100, -100, 200, -200)
    val bytes = wav(1, 16000, samples)
    val df = Seq((1L, bytes)).toDF("id", "payload")
    val f = Multimodal.extractFeatures(df, dim = 8)
      .select($"features").collect().head.getSeq[Float](0)
    assert(f(0) == 2f && f(1) == 1f && f(2) == 16000f && f(3) == 4f)
    assert(f(4) == 0f) // mean
    assert(f(5) == math.sqrt((100.0 * 100 + 100 * 100 + 200 * 200 + 200 * 200) / 4).toFloat)
    assert(f(6) == -200f && f(7) == 200f)
  }

  test("decodePng: round-trips the from-scratch encoder; rejects CRC corruption, truncation, junk") {
    val rgb = Array.tabulate(4 * 3 * 3)(j => ((j * 13 + 7) % 251).toByte)
    val png = Multimodal.encodePng(4, 3, rgb)
    val im = Multimodal.decodePng(png).get
    assert(im.width == 4 && im.height == 3 && im.channels == 3)
    assert(im.pixels.toSeq == rgb.toSeq)
    // flip one bit inside the IHDR data → CRC check must reject
    val bad = png.clone(); bad(18) = (bad(18) ^ 1).toByte
    assert(Multimodal.decodePng(bad).isEmpty)
    assert(Multimodal.decodePng(png.dropRight(5)).isEmpty)
    assert(Multimodal.decodePng("not a png at all".getBytes).isEmpty)
    // a PNG payload must not be mistaken for PPM/WAV (distinct magics)
    assert(Multimodal.decodePpm(png).isEmpty && Multimodal.decodeWav(png).isEmpty)
  }

  test("decodePng: unfilters all five scanline filter types exactly") {
    // forward-filter a known raster with one row per filter type, then
    // the decoder must reconstruct the original bytes through each path
    val w = 5; val h = 5; val stride = w * 3; val bpp = 3
    val rgb = Array.tabulate(stride * h)(j => ((j * 37 + 11) % 256).toByte)
    val filters = Array(4, 0, 1, 2, 3) // Paeth on row 0 (a=b=c=0 edge), then the rest
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      raw(y * (stride + 1)) = filters(y).toByte
      for (x <- 0 until stride) {
        val cur = rgb(y * stride + x) & 0xff
        val a = if (x >= bpp) rgb(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) rgb((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = filters(y) match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            cur - (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        raw(y * (stride + 1) + 1 + x) = filtered.toByte
      }
    }
    val im = Multimodal.decodePng(Multimodal.encodePngRaw(w, h, raw)).get
    assert(im.pixels.toSeq == rgb.toSeq, "unfilter did not invert the forward filters")
  }

  test("decodePng: agrees with the independent JDK ImageIO encoder") {
    // ImageIO is a second, unrelated PNG implementation in the JDK — its
    // output (including whatever row filters its heuristics choose) must
    // decode to the exact raster we put in
    val w = 23; val h = 17
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 11 + y * 3) % 256; val g = (x * x + 7 * y) % 256; val b = (x * 5 + y * 13) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val im = Multimodal.decodePng(baos.toByteArray).get
    assert(im.width == w && im.height == h && im.channels == 3)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y); val o = (y * w + x) * 3
      assert((im.pixels(o) & 0xff) == ((argb >> 16) & 0xff) &&
        (im.pixels(o + 1) & 0xff) == ((argb >> 8) & 0xff) &&
        (im.pixels(o + 2) & 0xff) == (argb & 0xff), s"pixel ($x,$y) mismatch")
    }
  }

  test("decodePng: gray and RGBA color types via ImageIO; alpha excluded from feature means") {
    import java.awt.image.BufferedImage
    def viaImageIO(img: BufferedImage): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", baos)); baos.toByteArray
    }
    // 8-bit grayscale (color type 0, 1 channel)
    val gray = new BufferedImage(6, 4, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 6) gray.getRaster.setSample(x, y, 0, (x * 40 + y * 11) % 256)
    val g = Multimodal.decodePng(viaImageIO(gray)).get
    assert(g.channels == 1 && g.width == 6 && g.height == 4)
    for (y <- 0 until 4; x <- 0 until 6)
      assert((g.pixels(y * 6 + x) & 0xff) == (x * 40 + y * 11) % 256)
    // RGBA (color type 6, 4 channels) with a non-opaque alpha
    val rgba = new BufferedImage(5, 3, BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 3; x <- 0 until 5)
      rgba.setRGB(x, y, ((x * 50 + y) % 256 << 24) | (10 << 16) | (20 << 8) | 30)
    val a = Multimodal.decodePng(viaImageIO(rgba)).get
    assert(a.channels == 4 && a.width == 5 && a.height == 3)
    assert((0 until 15).forall { p =>
      (a.pixels(p * 4) & 0xff) == 10 && (a.pixels(p * 4 + 1) & 0xff) == 20 &&
        (a.pixels(p * 4 + 2) & 0xff) == 30
    })
    // feature means come from the COLOR channels only — constant (10,20,30)
    // regardless of the varying alpha plane
    val df = Seq((1L, viaImageIO(rgba))).toDF("id", "payload")
    val f = Multimodal.extractFeatures(df, dim = 8)
      .select($"features").collect().head.getSeq[Float](0)
    assert(f(0) == 3f && f(3) == 4f) // png, 4 channels
    assert(f(4) == 10f && f(5) == 20f && f(6) == 30f && f(7) == 20f)
  }

  test("extractFeatures on PNG: channel means match hand-computed values after the full round trip") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val feats = Multimodal.extractFeatures(
        Multimodal.syntheticPng(df, "id", width = 4, height = 3), dim = 8)
      .select($"id", $"features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def mean(seed: Long, ch: Int): Float =
      ((0 until 36).filter(_ % 3 == ch).map(j => (seed * 7 + j) % 251).sum / 12.0).toFloat
    assert(feats(1L).take(4) == Seq(3f, 4f, 3f, 3f)) // fmt=png, w, h, channels
    assert(feats(1L)(4) == mean(1L, 0) && feats(1L)(5) == mean(1L, 1) && feats(1L)(6) == mean(1L, 2))
    assert(feats(1L) != feats(2L))
    assert(feats(2L)(4) == mean(2L, 0))
  }

  test("decodeJpeg: EXACT round trip on block-constant gray with unit quant; ImageIO agrees exactly") {
    import graft.operators.Jpeg
    // constant 8x8 blocks + all-ones quant: only the DC coefficient
    // survives, integer-scaled by 8 — the DCT round trip is exact
    val vals = Array(10, 250, 128, 37)
    val gray = new Array[Byte](16 * 16)
    for (y <- 0 until 16; x <- 0 until 16)
      gray(y * 16 + x) = vals((y / 8) * 2 + x / 8).toByte
    val jpg = Jpeg.encodeGray(16, 16, gray, Jpeg.UnitQuant)
    val im = Jpeg.decode(jpg).get
    assert(im.width == 16 && im.height == 16 && im.channels == 1)
    assert(im.pixels.toSeq == gray.toSeq, "unit-quant constant blocks must round-trip exactly")
    // the JDK's independent decoder must agree bit-for-bit on DC-only data
    val jimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(jimg != null, "ImageIO could not parse our baseline JPEG")
    for (y <- 0 until 16; x <- 0 until 16)
      assert(jimg.getRaster.getSample(x, y, 0) == (gray(y * 16 + x) & 0xff),
        s"ImageIO disagrees at ($x,$y)")
  }

  test("decodeJpeg: lossy color 4:4:4 vs the independent JDK decoder within IDCT tolerance") {
    import graft.operators.Jpeg
    // non-multiple-of-8 dims exercise MCU padding + crop; Annex K tables
    // exercise real quantization. The spec leaves IDCT rounding
    // implementation-defined — two correct decoders may differ by a
    // couple of levels per sample, hence the ±2 band (color conversion
    // rounding included).
    val w = 21; val h = 13
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 11 + y * 3) % 256).toByte
      rgb(o + 1) = ((x * 2 + 7 * y) % 256).toByte
      rgb(o + 2) = ((x * 5 + y * 13) % 256).toByte
    }
    val jpg = Jpeg.encode(w, h, rgb)
    val im = Jpeg.decode(jpg).get
    assert(im.width == w && im.height == h && im.channels == 3)
    val jimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    assert(jimg != null && jimg.getWidth == w && jimg.getHeight == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val argb = jimg.getRGB(x, y); val o = (y * w + x) * 3
      val ours = Seq(im.pixels(o) & 0xff, im.pixels(o + 1) & 0xff, im.pixels(o + 2) & 0xff)
      val theirs = Seq((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff)
      maxDiff = math.max(maxDiff, ours.zip(theirs).map(p => math.abs(p._1 - p._2)).max)
    }
    assert(maxDiff <= 2, s"decoders diverge by $maxDiff (>2) — not IDCT rounding noise")
  }

  test("decodeJpeg: progressive EXACT round trip on block-constant gray; identical to baseline on color") {
    import graft.operators.Jpeg
    // gray, unit quant, block-constant: DC-only survives — the DC-first
    // (Al=1) + refinement (Al=0) + AC-band script must reassemble it
    // exactly, like baseline
    val vals = Array(10, 250, 128, 37)
    val gray = new Array[Byte](16 * 16)
    for (y <- 0 until 16; x <- 0 until 16)
      gray(y * 16 + x) = vals((y / 8) * 2 + x / 8).toByte
    val prog = Jpeg.encodeGrayProgressive(16, 16, gray, Jpeg.UnitQuant)
    // really a progressive stream (SOF2 present, SOF0 absent)
    assert((0 until prog.length - 1).exists(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc2))
    val im = Jpeg.decode(prog).get
    assert(im.width == 16 && im.height == 16 && im.channels == 1)
    assert(im.pixels.toSeq == gray.toSeq,
      "progressive unit-quant constant blocks must round-trip exactly")
    // color, Annex K tables, padded dims: the progressive script carries
    // the SAME quantized coefficients as baseline — decoded pixels must
    // be IDENTICAL, not merely close
    val w = 21; val h = 13
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = ((x * 11 + y * 3) % 256).toByte
      rgb(o + 1) = ((x * 2 + 7 * y) % 256).toByte
      rgb(o + 2) = ((x * 5 + y * 13) % 256).toByte
    }
    val base = Jpeg.decode(Jpeg.encode(w, h, rgb)).get
    val prg = Jpeg.decode(Jpeg.encodeProgressive(w, h, rgb)).get
    assert(prg.width == w && prg.height == h && prg.channels == 3)
    assert(prg.pixels.toSeq == base.pixels.toSeq,
      "progressive and baseline decode of the same coefficients diverged")
  }

  test("decodeJpeg: progressive vs the independent JDK codec (its own scan script, AC refinement included)") {
    import graft.operators.Jpeg
    import javax.imageio.{ImageIO, ImageWriteParam}
    def jdkProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      ios.close(); writer.dispose()
      val jpg = bos.toByteArray
      assert((0 until jpg.length - 1).exists(i =>
        (jpg(i) & 0xff) == 0xff && (jpg(i + 1) & 0xff) == 0xc2),
        "JDK writer did not produce SOF2 — progressive mode not exercised")
      jpg
    }
    // The JDK encoder's default progressive script uses successive
    // approximation on AC bands (Al 2→1→0) — the refinement decode path
    // our own fixture encoder doesn't emit. GRAY carries the strict ±2
    // contract: single component, so no chroma-upsampling ambiguity —
    // any residual difference is IDCT rounding alone.
    val w = 24; val h = 17
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      gimg.getRaster.setSample(x, y, 0, (x * 11 + y * 7) % 256)
    val gjpg = jdkProgressive(gimg)
    val gim = Jpeg.decode(gjpg).getOrElse(fail("our decoder rejected the JDK progressive gray stream"))
    assert(gim.width == w && gim.height == h && gim.channels == 1)
    val gback = ImageIO.read(new java.io.ByteArrayInputStream(gjpg))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w)
      maxDiff = math.max(maxDiff,
        math.abs((gim.pixels(y * w + x) & 0xff) - gback.getRaster.getSample(x, y, 0)))
    assert(maxDiff <= 2, s"progressive decoders diverge by $maxDiff (>2) on gray")
    // COLOR from the JDK writer is 4:2:0 — its reader upsamples chroma
    // with a triangle filter where this decoder replicates (both valid;
    // T.81 leaves upsampling implementation-defined), so per-pixel
    // equality is the wrong contract. Check decode + per-channel MEANS,
    // which any correct upsampling preserves to well under a level.
    val cimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      cimg.setRGB(x, y, (((x * 11 + y * 3) % 256) << 16) |
        (((x * 2 + 7 * y) % 256) << 8) | ((x * 5 + y * 13) % 256))
    val cjpg = jdkProgressive(cimg)
    val cim = Jpeg.decode(cjpg).getOrElse(fail("our decoder rejected the JDK progressive color stream"))
    assert(cim.width == w && cim.height == h && cim.channels == 3)
    val cback = ImageIO.read(new java.io.ByteArrayInputStream(cjpg))
    val oursMean = new Array[Double](3); val theirsMean = new Array[Double](3)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      oursMean(c) += (cim.pixels((y * w + x) * 3 + c) & 0xff).toDouble
      theirsMean(c) += ((cback.getRGB(x, y) >> (16 - 8 * c)) & 0xff).toDouble
    }
    for (c <- 0 until 3)
      assert(math.abs(oursMean(c) - theirsMean(c)) / (w * h) <= 1.5,
        s"channel $c mean diverges: ${oursMean(c) / (w * h)} vs ${theirsMean(c) / (w * h)}")
  }

  test("decodeJpeg: 2000 deterministically mangled PROGRESSIVE streams never throw") {
    import graft.operators.Jpeg
    val gray = Array.tabulate(16 * 16)(j => ((j * 31 + 7) % 251).toByte)
    val base = Jpeg.encodeGrayProgressive(16, 16, gray)
    assert(Jpeg.decode(base).isDefined)
    val rnd = new scala.util.Random(1234)
    for (_ <- 0 until 2000) {
      val m = base.clone()
      val n = 1 + rnd.nextInt(3)
      for (_ <- 0 until n) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Jpeg.decode(m) // None or a well-formed image — never an escape
    }
    // truncations at every length in the tail
    for (cut <- 1 until math.min(base.length, 600))
      Jpeg.decode(base.take(base.length - cut))
  }

  test("decodeJpeg: restart markers honored; truncation/progressive/junk rejected") {
    import graft.operators.Jpeg
    val gray = Array.tabulate(24 * 8)(j => ((j * 13 + 5) % 251).toByte)
    // restart interval 1: an RST marker (and a DC-predictor reset) after
    // every MCU — decode must consume them and still be exact under unit quant
    val withRst = Jpeg.encodeGray(24, 8, {
      val g = new Array[Byte](24 * 8)
      for (y <- 0 until 8; x <- 0 until 24) g(y * 24 + x) = Array(40, 200, 90)(x / 8).toByte
      g
    }, Jpeg.UnitQuant, restartInterval = 1)
    val im = Jpeg.decode(withRst).get
    for (y <- 0 until 8; x <- 0 until 24)
      assert((im.pixels(y * 24 + x) & 0xff) == Array(40, 200, 90)(x / 8),
        s"restart-coded block wrong at ($x,$y)")
    // truncated scan / truncated header / junk → None, never garbage
    val whole = Jpeg.encodeGray(24, 8, gray)
    assert(Jpeg.decode(whole).isDefined)
    assert(Jpeg.decode(whole.dropRight(6)).isEmpty, "EOI missing must reject")
    assert(Jpeg.decode(whole.take(20)).isEmpty)
    assert(Jpeg.decode("definitely not a jpeg".getBytes).isEmpty)
    // a LYING frame header must be declined, not mis-decoded: patching
    // SOF0 → SOF2 makes the baseline scan header (Ss=0, Se=63) illegal
    // for a progressive frame (DC scans are Ss=Se=0)
    val prog = whole.clone()
    val sofAt = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog).isEmpty,
      "baseline scan header inside a progressive frame must reject")
    // and a JPEG payload is not mistaken for the other containers
    assert(Multimodal.decodePng(whole).isEmpty && Multimodal.decodePpm(whole).isEmpty &&
      Multimodal.decodeWav(whole).isEmpty)
  }

  test("decodeJpeg: 2000 deterministically mangled streams never throw (None or well-formed)") {
    import graft.operators.Jpeg
    // JPEG carries no payload CRC, so corrupt entropy data may decode to
    // a well-formed-but-wrong image — the contract here is narrower and
    // absolute: decode() must never escape with an exception, whatever
    // the bytes (the Option funnel the executor path relies on).
    // A 20k-trial run of this battery passed during development.
    val gray = Array.tabulate(16 * 16)(j => ((j * 31 + 7) % 251).toByte)
    val base = Jpeg.encodeGray(16, 16, gray)
    var seed = 12345L
    for (trial <- 0 until 2000) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val b = base.clone()
      var s2 = seed
      for (_ <- 0 to (((seed >>> 33) % 4)).toInt) {
        s2 = s2 * 6364136223846793005L + 1442695040888963407L
        val pos = (((s2 >>> 20) % b.length).toInt + b.length) % b.length
        b(pos) = (s2 >>> 40).toByte
      }
      Jpeg.decode(b) // must not throw
      if (trial % 50 == 0)
        Jpeg.decode(base.take((((s2 >>> 13) % base.length).toInt + base.length) % base.length))
    }
  }

  test("extractFeatures on JPEG: tag 4, exact means through the synthetic generator") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val feats = Multimodal.extractFeatures(
        Multimodal.syntheticJpeg(df, "id", width = 16, height = 16), dim = 8)
      .select($"id", $"features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def mean(seed: Long): Float =
      ((0 until 4).map(b => (seed * 7 + b) % 251).sum / 4.0).toFloat
    assert(feats(1L).take(4) == Seq(4f, 16f, 16f, 1f)) // fmt=jpeg, w, h, 1 channel
    assert(feats(1L)(4) == mean(1L) && feats(1L)(7) == mean(1L))
    assert(feats(2L)(4) == mean(2L))
    assert(feats(1L) != feats(2L))
  }

  /** Raw-payload WAV builder (for the 8-bit/4-bit codec formats the
    * Short-based `wav` helper can't express). */
  private def wavRaw(channels: Int, rate: Int, data: Array[Byte],
      audioFormat: Int, bps: Int, blockAlign: Int): Array[Byte] = {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = le16(audioFormat) ++ le16(channels) ++ le32(rate) ++
      le32(rate) ++ le16(blockAlign) ++ le16(bps)
    "RIFF".getBytes ++ le32(4 + 8 + fmt.length + 8 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(fmt.length) ++ fmt ++
      "data".getBytes ++ le32(data.length) ++ data
  }

  test("G.711: mu-law/A-law expansion matches the published codec tables at the edges") {
    // μ-law: 0xFF → 0 (positive zero), 0x7F → 0 (negative zero),
    // 0x80 → +32124 (max), 0x00 → -32124
    assert(Multimodal.mulawExpand(0xff.toByte) === 0)
    assert(Multimodal.mulawExpand(0x7f.toByte) === 0)
    assert(Multimodal.mulawExpand(0x80.toByte) === 32124)
    assert(Multimodal.mulawExpand(0x00.toByte) === -32124)
    // A-law: 0xD5 → +8 (canonical silence), 0x55 → -8, 0xAA → +32256
    // (max), 0x2A → -32256; sign bit SET is positive (inverted vs μ-law)
    assert(Multimodal.alawExpand(0xd5.toByte) === 8)
    assert(Multimodal.alawExpand(0x55.toByte) === -8)
    assert(Multimodal.alawExpand(0xaa.toByte) === 32256)
    assert(Multimodal.alawExpand(0x2a.toByte) === -32256)
    // the expansions decode through the WAV container (fmt 7 / fmt 6)
    val mu = Multimodal.decodeWav(wavRaw(1, 8000,
      Array(0xff, 0x80, 0x00, 0x7f).map(_.toByte), audioFormat = 7,
      bps = 8, blockAlign = 1)).get
    assert(mu.samples.toSeq === Seq[Short](0, 32124, -32124, 0))
    val al = Multimodal.decodeWav(wavRaw(1, 8000,
      Array(0xd5, 0xaa, 0x2a, 0x55).map(_.toByte), audioFormat = 6,
      bps = 8, blockAlign = 1)).get
    assert(al.samples.toSeq === Seq[Short](8, 32256, -32256, -8))
  }

  test("G.711 mu-law: agrees with the JDK's independent javax.sound converter on all 256 codes") {
    import javax.sound.sampled._
    val codes = Array.tabulate(256)(_.toByte)
    val src = new AudioInputStream(
      new java.io.ByteArrayInputStream(codes),
      new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false),
      codes.length.toLong)
    val pcm = AudioSystem.getAudioInputStream(
      new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false), src)
    val out = pcm.readAllBytes()
    val jdk = Array.tabulate(256)(i => ((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort)
    val mine = codes.map(Multimodal.mulawExpand)
    assert(mine.toSeq === jdk.toSeq)
  }

  test("IMA ADPCM: hand-stepped nibble reconstruction, clamps, and rejection paths") {
    // block: predictor=100, index=0, nibbles 0x3 then 0xF (one byte,
    // low nibble first), padded with 0x0 pairs to blockAlign=8.
    // Hand-stepped per the IMA spec (step table [7,8,...]):
    //  code 3 @ step 7: diff = 0+3+1 = 4 → 104; index += -1 → 0
    //  code F @ step 7: diff = 0+7+3+1 = 11, sign → 93; index += 8 → 8
    //  code 0 @ step 16 (idx 8): diff = 2 → 95; index += -1 → 7
    //  code 0 @ step 14 (idx 7): diff = 1 → 96; index -> 6
    //  code 0 @ step 13 (idx 6): diff = 1 → 97
    //  code 0 @ step 12 (idx 5): diff = 1 → 98
    //  code 0 @ step 11 (idx 4): diff = 1 → 99
    //  code 0 @ step 10 (idx 3): diff = 1 → 100
    val block = Array[Byte](100, 0, 0, 0, 0xf3.toByte, 0, 0, 0)
    val got = Multimodal.adpcmDecodeMono(block, blockAlign = 8).get
    assert(got.toSeq === Seq[Short](100, 104, 93, 95, 96, 97, 98, 99, 100))
    // container path: fmt 0x11, bps 4, mono
    val viaWav = Multimodal.decodeWav(wavRaw(1, 8000, block,
      audioFormat = 0x11, bps = 4, blockAlign = 8)).get
    assert(viaWav.samples.toSeq === got.toSeq)
    // rejections: trailing partial block, corrupt header index, stereo
    assert(Multimodal.adpcmDecodeMono(block.dropRight(1), 8).isEmpty)
    assert(Multimodal.adpcmDecodeMono(
      Array[Byte](0, 0, 89, 0, 0, 0, 0, 0), 8).isEmpty) // index 89 > 88
    assert(Multimodal.decodeWav(wavRaw(2, 8000, block ++ block,
      audioFormat = 0x11, bps = 4, blockAlign = 8)).isEmpty)
  }

  test("extractFeatures on mu-law WAV: tag 2, exact moments through the synthetic generator") {
    val out = Multimodal.extractFeatures(
        Multimodal.syntheticWavMulaw(Seq(4L, 11L).toDF("doc_id"), "doc_id", nSamples = 16),
        dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (seed <- Seq(4L, 11L)) {
      val f = out(seed)
      val smp = (0 until 16).map(j =>
        Multimodal.mulawExpand((((seed * 7 + j) % 251).toInt & 0xff).toByte).toInt)
      assert(f(0) === 2f && f(1) === 1f && f(2) === 8000f && f(3) === 16f)
      assert(f(4) === (smp.map(_.toLong).sum / 16.0).toFloat)
      assert(f(6) === smp.min.toFloat && f(7) === smp.max.toFloat)
    }
  }

  test("decodeY4m: C420/C444/mono geometry, frame params, hand-computed means") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def bytes(s: String, raster: Array[Byte]*): Array[Byte] =
      s.getBytes(ascii) ++ raster.flatten
    // 2x2 C420: per frame Y=4 bytes, U=1, V=1. Two frames, one with a
    // parameter-tagged FRAME marker (must be tolerated)
    val f1 = Array[Byte](10, 20, 30, 40, 100, 120)
    val f2 = Array[Byte](50, 60, 70, 80, 110, 130.toByte)
    val v = Multimodal.decodeY4m(
      bytes("YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n", f1) ++
        bytes("FRAME Xtag\n", f2)).get
    assert((v.width, v.height, v.colorspace, v.nFrames) === (2, 2, "420", 2))
    assert(v.raster === f1 ++ f2)
    // feature means: Y = (10+20+30+40+50+60+70+80)/8, U = (100+110)/2,
    // V = (120+130)/2
    val feats = Multimodal.contentFeatures(
      bytes("YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n", f1) ++ bytes("FRAME\n", f2), 8)
    assert(feats(0) === 5f && feats(1) === 2f && feats(2) === 2f && feats(3) === 2f)
    assert(feats(4) === 45f && feats(5) === 105f && feats(6) === 125f)
    // C tag absent → 420 is the spec default
    assert(Multimodal.decodeY4m(bytes("YUV4MPEG2 W2 H2\nFRAME\n", f1)).isDefined)
    // C444: three full planes; mono: luma only, chroma slots repeat luma
    val v444 = Multimodal.decodeY4m(bytes("YUV4MPEG2 W2 H1 C444\nFRAME\n",
      Array[Byte](1, 2, 3, 4, 5, 6))).get
    assert(v444.colorspace === "444" && v444.raster.length === 6)
    val monoFeats = Multimodal.contentFeatures(
      bytes("YUV4MPEG2 W2 H2 Cmono\nFRAME\n", Array[Byte](8, 16, 24, 32)), 8)
    assert(monoFeats(4) === 20f && monoFeats(5) === 20f && monoFeats(6) === 20f)
  }

  test("decodeY4m: malformed streams reject to None, never garbage") {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def b(s: String, n: Int = 0): Array[Byte] = s.getBytes(ascii) ++ new Array[Byte](n)
    assert(Multimodal.decodeY4m(b("YUV4MPEG3 W2 H2\nFRAME\n", 6)).isEmpty) // magic
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2\nFRAME\n", 6)).isEmpty) // no H
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 Hx\nFRAME\n", 6)).isEmpty) // bad digits
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W3 H2 C420\nFRAME\n", 9)).isEmpty) // odd dim
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C422\nFRAME\n", 6)).isEmpty) // unsupported cs
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C420\n")).isEmpty) // zero frames
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C420\nFRAME\n", 5)).isEmpty) // truncated
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C420\nFRAMEX\n", 6)).isEmpty) // mangled marker
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C420")).isEmpty) // unterminated header
    // trailing junk after the last complete frame = a mangled next marker
    assert(Multimodal.decodeY4m(b("YUV4MPEG2 W2 H2 C420\nFRAME\n", 6) ++
      "zz".getBytes(ascii)).isEmpty)
  }

  test("extractFeatures on Y4M: tag 5, exact means through the synthetic generator") {
    val docs = Seq(3L, 9L).toDF("doc_id")
    val out = Multimodal.extractFeatures(
        Multimodal.syntheticY4m(docs, "doc_id", width = 4, height = 4, nFrames = 3),
        dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (seed <- Seq(3L, 9L)) {
      val f = out(seed)
      // recompute from the seed arithmetic (what the l08e oracle does)
      def m(lo: Int, hi: Int): Float = {
        val js = for (fr <- 0 until 3; p <- lo until hi) yield fr * 24 + p
        (js.map(j => (seed * 7 + j) % 251).sum / js.size.toDouble).toFloat
      }
      assert(f(0) === 5f && f(1) === 4f && f(2) === 4f && f(3) === 3f)
      assert(f(4) === m(0, 16) && f(5) === m(16, 20) && f(6) === m(20, 24))
    }
  }

  test("decodeAviMjpeg: demux + per-frame JPEG decode, exact means, frame order pinned") {
    import graft.operators.Jpeg
    // two 8x8 block-constant gray frames (unit quant → EXACT decode)
    def grayFrame(v: Int): Array[Byte] =
      Jpeg.encodeGray(8, 8, Array.fill(64)(v.toByte), Jpeg.UnitQuant)
    val avi = Multimodal.aviMjpegContainer(8, 8, Seq(grayFrame(40), grayFrame(90)))
    val demux = Multimodal.decodeAviMjpeg(avi).get
    assert((demux.width, demux.height, demux.frames.length) === (8, 8, 2))
    // each movi chunk is byte-for-byte the JPEG that went in
    assert(demux.frames(0) === grayFrame(40) && demux.frames(1) === grayFrame(90))
    val f = Multimodal.contentFeatures(avi, 8)
    assert(f(0) === 6f && f(1) === 8f && f(2) === 8f && f(3) === 2f && f(4) === 1f)
    assert(f(5) === 65f, "whole-clip mean") // (40 + 90) / 2
    assert(f(6) === 40f && f(7) === 90f, "first/last frame means — order matters")
  }

  test("decodeAviMjpeg: malformed and non-MJPG containers reject to None, never garbage") {
    import graft.operators.Jpeg
    def grayFrame(v: Int): Array[Byte] =
      Jpeg.encodeGray(8, 8, Array.fill(64)(v.toByte), Jpeg.UnitQuant)
    val good = Multimodal.aviMjpegContainer(8, 8, Seq(grayFrame(40), grayFrame(90)))
    // truncation anywhere (container OR frame leg) → None
    for (cut <- Seq(4, 40, good.length / 2, good.length - 3))
      assert(Multimodal.decodeAviMjpeg(good.take(cut)).isEmpty, s"cut at $cut")
    // a WAV is RIFF too — must not demux as AVI (and still decodes as audio)
    val wav = Multimodal.contentFeatures(
      Seq(5L).toDF("doc_id").transform(Multimodal.syntheticWavMulaw(_, "doc_id", 16))
        .select($"payload").collect().head.getAs[Array[Byte]](0), 8)
    assert(wav(0) === 2f, "WAV misrouted by the AVI demux")
    // flip the strh handler AND strf biCompression to a raw-DIB vids
    // stream: structurally valid AVI, unsupported codec → quarantine
    def patch(b: Array[Byte], at: Int, s: String): Array[Byte] = {
      val c = b.clone(); s.getBytes.zipWithIndex.foreach { case (x, i) => c(at + i) = x }; c
    }
    def find(b: Array[Byte], s: String): Int = {
      val pat = s.getBytes
      (0 to b.length - pat.length).find(i => pat.indices.forall(j => b(i + j) == pat(j))).get
    }
    val h1 = find(good, "MJPG")
    val notMjpg0 = patch(good, h1, "DIB ")
    val h2 = find(notMjpg0, "MJPG")
    val notMjpg = patch(notMjpg0, h2, "DIB ")
    assert(Multimodal.decodeAviMjpeg(notMjpg).isEmpty)
    // 2000 deterministically mangled containers never throw
    val rnd = new scala.util.Random(1234)
    for (_ <- 0 until 2000) {
      val c = good.clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      val d = Multimodal.decodeAviMjpeg(c) // None or well-formed, never a throw
      d.foreach(v => assert(v.width > 0 && v.height > 0 && v.frames.nonEmpty))
      Multimodal.contentFeatures(c, 8) // and the feature path never throws either
    }
  }

  test("extractFeatures on AVI/MJPEG: tag 6, exact means through the synthetic generator") {
    val docs = Seq(3L, 9L).toDF("doc_id")
    val out = Multimodal.extractFeatures(
        Multimodal.syntheticAviMjpeg(docs, "doc_id", width = 16, height = 16, nFrames = 3),
        dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (seed <- Seq(3L, 9L)) {
      val f = out(seed)
      // 16x16 → 4 blocks per frame; block b of frame fr holds
      // (seed*7 + fr*4 + b) % 251 — recompute exactly (the l08h oracle)
      def m(js: Seq[Int]): Float =
        (js.map(j => (seed * 7 + j) % 251).sum / js.size.toDouble).toFloat
      assert(f(0) === 6f && f(1) === 16f && f(2) === 16f && f(3) === 3f && f(4) === 1f)
      assert(f(5) === m(0 until 12), "whole-clip mean")
      assert(f(6) === m(0 until 4), "first frame")
      assert(f(7) === m(8 until 12), "last frame")
    }
  }

  test("decodeMp3Meta: frame walk, VBR mean, ID3 tags; strict rejection of splices and truncation") {
    // hand-built frames: MPEG-1 Layer III, 44.1 kHz mono, no CRC
    def frame(kbps: Int, bi: Int): Array[Byte] = {
      val len = 144000 * kbps / 44100
      Array(0xff.toByte, 0xfb.toByte, (bi << 4).toByte, 0xc0.toByte) ++
        new Array[Byte](len - 4)
    }
    val cbr = frame(128, 9) ++ frame(128, 9)
    val m = Multimodal.decodeMp3Meta(cbr).get
    assert((m.sampleRate, m.channels, m.layer, m.nFrames) === (44100, 1, 3, 2))
    assert(m.meanKbps === 128.0)
    assert(m.durationSec === 2.0 * 1152 / 44100)
    // VBR: bitrate index may vary per frame; the mean reflects it
    val vbr = frame(128, 9) ++ frame(192, 11)
    assert(Multimodal.decodeMp3Meta(vbr).get.meanKbps === 160.0)
    // ID3v2 front tag and ID3v1 tail tag both skip cleanly
    val id3v2 = "ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 16) ++
      new Array[Byte](16)
    val id3v1 = "TAG".getBytes ++ new Array[Byte](125)
    assert(Multimodal.decodeMp3Meta(id3v2 ++ cbr ++ id3v1).get.nFrames === 2)
    // rejections, each a distinct failure mode: MPEG-2 version bits,
    // free bitrate, reserved sample rate, a mid-stream rate splice,
    // truncated final frame, non-tag trailing junk
    val mpeg2 = cbr.clone(); mpeg2(1) = 0xf3.toByte
    assert(Multimodal.decodeMp3Meta(mpeg2).isEmpty)
    val free = cbr.clone(); free(2) = 0x00
    assert(Multimodal.decodeMp3Meta(free).isEmpty)
    val badRate = cbr.clone(); badRate(2) = ((9 << 4) | 0x0c).toByte
    assert(Multimodal.decodeMp3Meta(badRate).isEmpty)
    val spliced = frame(128, 9) ++ frame(128, 9)
    spliced(frame(128, 9).length + 2) = ((9 << 4) | 0x04).toByte // 48 kHz mid-stream
    assert(Multimodal.decodeMp3Meta(spliced).isEmpty)
    assert(Multimodal.decodeMp3Meta(cbr.dropRight(5)).isEmpty)
    assert(Multimodal.decodeMp3Meta(cbr ++ "junk!".getBytes).isEmpty)
    // 2000 deterministically mangled streams never throw
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 2000) {
      val c = (id3v2 ++ vbr).clone()
      c(rnd.nextInt(c.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeMp3Meta(c)
      Multimodal.contentFeatures(c, 8)
    }
  }

  test("extractFeatures on MP3: tag 7, metadata recomputed from the seed through the generator") {
    val docs = Seq(3L, 4L, 6L).toDF("doc_id") // odd, even(ID3v2), div-3(ID3v1)
    val out = Multimodal.extractFeatures(
        Multimodal.syntheticMp3(docs, "doc_id"), dim = 8)
      .select($"doc_id", $"features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    for (seed <- Seq(3L, 4L, 6L)) {
      val f = out(seed)
      val n = (3 + seed % 5).toInt
      val kbps = (0 until n).map(fr => Array(128, 160, 192)(((seed + fr) % 3).toInt))
      assert(f(0) === 7f && f(1) === 44100f && f(2) === 1f && f(3) === n.toFloat)
      assert(f(4) === 3f, "layer")
      assert(f(5) === (kbps.sum.toDouble / n).toFloat, "VBR mean kbps")
      assert(f(6) === (n.toDouble * 1152 / 44100).toFloat, "duration")
    }
  }

  test("unknown formats fall back to the deterministic stub, same dim") {
    val df = Seq((1L, "not an image at all".getBytes)).toDF("id", "payload")
    val f1 = Multimodal.extractFeatures(df, dim = 8).select($"features").collect().head.getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(df, dim = 8).select($"features").collect().head.getSeq[Float](0)
    assert(f1.size == 8 && f1 == f2)
  }

  // ---------------------------------------------------------------- GIF

  private def gifIndices(w: Int, h: Int, seed: Long, frame: Int = 0): Array[Byte] =
    Array.tabulate(w * h)(p => (((seed * 7 + frame.toLong * w * h + p) % 251 + 251) % 251).toByte)

  test("decodeGif: LZW round trip (plain + interlaced + multi-frame), exact palette-mapped pixels") {
    val w = 7; val h = 11 // odd dims exercise the interlace pass boundaries
    val idx = gifIndices(w, h, 3L)
    for (interlaced <- Seq(false, true)) {
      val gif = Multimodal.gifContainer(w, h, Seq(idx), interlaced = interlaced)
      val im = Multimodal.decodeGif(gif).getOrElse(fail(s"decode failed interlaced=$interlaced"))
      assert(im.width == w && im.height == h && im.nFrames == 1)
      for (p <- 0 until w * h) {
        val i = idx(p) & 0xff
        assert((im.frames(0)(p * 3) & 0xff) == i, s"R at $p interlaced=$interlaced")
        assert((im.frames(0)(p * 3 + 1) & 0xff) == (i * 2) % 256)
        assert((im.frames(0)(p * 3 + 2) & 0xff) == (i * 3) % 256)
      }
    }
    // multi-frame: both frames decode, in order
    val f0 = gifIndices(4, 4, 9L, frame = 0); val f1 = gifIndices(4, 4, 9L, frame = 1)
    val anim = Multimodal.decodeGif(Multimodal.gifContainer(4, 4, Seq(f0, f1))).get
    assert(anim.nFrames == 2)
    assert((anim.frames(0)(0) & 0xff) == (f0(0) & 0xff))
    assert((anim.frames(1)(0) & 0xff) == (f1(0) & 0xff))
  }

  test("decodeGif: a long uniform run survives dictionary growth (real compression, not just literals)") {
    // ImageIO's writer (below) emits genuinely compressed streams, but
    // pin the width-growth path with a crafted worst case too: a 64x64
    // constant image written by ImageIO compresses to long KwKwK chains
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val g2 = img.createGraphics()
    g2.setColor(new java.awt.Color(10, 20, 30)); g2.fillRect(0, 0, 64, 64); g2.dispose()
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val im = Multimodal.decodeGif(baos.toByteArray).getOrElse(fail("decode of ImageIO GIF failed"))
    assert(im.width == 64 && im.height == 64)
    // every pixel identical, and equal to what ImageIO itself reads back
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(baos.toByteArray))
    val rgb0 = ref.getRGB(0, 0)
    for (p <- 0 until 64 * 64) {
      assert((im.frames(0)(p * 3) & 0xff) == ((rgb0 >> 16) & 0xff))
      assert((im.frames(0)(p * 3 + 1) & 0xff) == ((rgb0 >> 8) & 0xff))
      assert((im.frames(0)(p * 3 + 2) & 0xff) == (rgb0 & 0xff))
    }
  }

  test("decodeGif: agrees with the independent JDK ImageIO codec in BOTH directions") {
    // direction 1: our writer, ImageIO's reader — pixel-exact
    val w = 13; val h = 9
    val idx = gifIndices(w, h, 5L)
    val ours = Multimodal.gifContainer(w, h, Seq(idx))
    val jimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(jimg != null, "ImageIO could not parse our GIF")
    for (y <- 0 until h; x <- 0 until w) {
      val i = idx(y * w + x) & 0xff
      val rgb = jimg.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == i && ((rgb >> 8) & 0xff) == (i * 2) % 256 &&
        (rgb & 0xff) == (i * 3) % 256, s"ImageIO disagrees at ($x,$y)")
    }
    // direction 2: ImageIO's writer (real LZW compression), our reader
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w) {
      val i = idx(y * w + x) & 0xff
      img.setRGB(x, y, (i << 16) | (((i * 2) % 256) << 8) | ((i * 3) % 256))
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos))
    val im = Multimodal.decodeGif(baos.toByteArray).getOrElse(fail("decode of ImageIO GIF failed"))
    assert(im.width == w && im.height == h && im.nFrames == 1)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y) // TYPE_BYTE_INDEXED may have quantized; compare to what was stored
      val p = (y * w + x) * 3
      assert((im.frames(0)(p) & 0xff) == ((rgb >> 16) & 0xff), s"R at ($x,$y)")
      assert((im.frames(0)(p + 1) & 0xff) == ((rgb >> 8) & 0xff), s"G at ($x,$y)")
      assert((im.frames(0)(p + 2) & 0xff) == (rgb & 0xff), s"B at ($x,$y)")
    }
  }

  test("decodeGif: malformed streams reject to None, never garbage") {
    val good = Multimodal.gifContainer(4, 3, Seq(gifIndices(4, 3, 1L)))
    assert(Multimodal.decodeGif(good).isDefined)
    // bad magic
    val bad = good.clone(); bad(0) = 'J'.toByte
    assert(Multimodal.decodeGif(bad).isEmpty)
    // missing trailer / truncation at every prefix
    for (cut <- 1 until good.length)
      assert(Multimodal.decodeGif(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    // partial-frame rect (left=1) must reject, not composite
    val part = good.clone()
    val desc = 6 + 7 + 768 // header + LSD + GCT → image separator offset
    assert(part(desc) == 0x2c.toByte)
    part(desc + 1) = 1 // left = 1
    assert(Multimodal.decodeGif(part).isEmpty)
    // 2000 deterministically mangled streams never throw
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val m = good.clone()
      val n = 1 + rnd.nextInt(4)
      for (_ <- 0 until n) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeGif(m) // Option or nothing — any throw fails the test
    }
  }

  test("extractFeatures on GIF: tag 8, exact means through the synthetic generator") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val feats = Multimodal.extractFeatures(
        Multimodal.syntheticGif(df, "id", width = 4, height = 3, nFrames = 2), dim = 8)
      .select($"id", $"features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def means(seed: Long): (Float, Float, Float) = {
      val idx = (0 until 24).map(j => ((seed * 7 + j) % 251).toInt)
      ((idx.map(_.toLong).sum / 24.0).toFloat,
        (idx.map(i => (i * 2) % 256).map(_.toLong).sum / 24.0).toFloat,
        (idx.map(i => (i * 3) % 256).map(_.toLong).sum / 24.0).toFloat)
    }
    val (r1, g1, b1) = means(1L)
    assert(feats(1L).take(4) == Seq(8f, 4f, 3f, 2f))
    assert(feats(1L)(4) == r1 && feats(1L)(5) == g1 && feats(1L)(6) == b1)
    assert(feats(1L) != feats(2L))
  }

  // ---------------------------------------------------------------- BMP

  test("decodeBmp: 24-bit round trip with row padding; top-down, 8-bit and 32-bit variants") {
    val w = 5; val h = 3 // rowSize 16 ≠ 15: padding exercised
    val rgb = Array.tabulate(w * h * 3)(j => ((7 + j) % 251).toByte)
    val bmp = Multimodal.bmpContainer(w, h, rgb)
    val im = Multimodal.decodeBmp(bmp).getOrElse(fail("decode failed"))
    assert(im.width == w && im.height == h && im.bpp == 24)
    assert(im.pixels.sameElements(rgb))
    // top-down: flip height sign and write rows unflipped → same pixels
    def le32(o: Int, v: Int, a: Array[Byte]): Unit = {
      a(o) = (v & 0xff).toByte; a(o + 1) = ((v >> 8) & 0xff).toByte
      a(o + 2) = ((v >> 16) & 0xff).toByte; a(o + 3) = ((v >> 24) & 0xff).toByte
    }
    val td = bmp.clone()
    le32(22, -h, td)
    val rowSize = (w * 3 + 3) / 4 * 4
    for (r <- 0 until h; x <- 0 until w; c <- 0 until 3) // re-order rows top-down
      td(54 + r * rowSize + x * 3 + c) = bmp(54 + (h - 1 - r) * rowSize + x * 3 + c)
    val imTd = Multimodal.decodeBmp(td).getOrElse(fail("top-down decode failed"))
    assert(imTd.pixels.sameElements(rgb))
    // 8-bit paletted: 2x2 with a 4-entry palette
    val pal8 = Array[Byte](
      'B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, // file header (offset patched below)
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 8, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      4, 0, 0, 0, 0, 0, 0, 0) ++ // colorsUsed=4
      Array[Byte](10, 20, 30, 0, 40, 50, 60, 0, 70, 80, 90, 0, 100, 110, 120, 0) ++ // BGRX
      Array[Byte](0, 1, 0, 0, 2, 3, 0, 0) // two 4-padded rows, bottom-up
    le32(10, 54 + 16, pal8)
    val im8 = Multimodal.decodeBmp(pal8).getOrElse(fail("8-bit decode failed"))
    assert(im8.bpp == 8 && im8.width == 2 && im8.height == 2)
    // bottom row in file = top row of image: indices 0,1 are the BOTTOM image row
    assert((im8.pixels(0) & 0xff) == 90 && (im8.pixels(1) & 0xff) == 80 && (im8.pixels(2) & 0xff) == 70) // idx 2 → BGR reversed
    // 32-bit: repack the 24-bit raster as BGRX
    val bgrx = new Array[Byte](54 + w * 4 * h)
    System.arraycopy(bmp, 0, bgrx, 0, 54)
    bgrx(28) = 32
    le32(34, w * 4 * h, bgrx)
    le32(2, bgrx.length, bgrx)
    for (r <- 0 until h; x <- 0 until w) {
      val s = 54 + r * rowSize + x * 3
      val d = 54 + r * w * 4 + x * 4
      bgrx(d) = bmp(s); bgrx(d + 1) = bmp(s + 1); bgrx(d + 2) = bmp(s + 2)
    }
    val im32 = Multimodal.decodeBmp(bgrx).getOrElse(fail("32-bit decode failed"))
    assert(im32.bpp == 32 && im32.pixels.sameElements(rgb))
  }

  test("decodeBmp: agrees with the independent JDK ImageIO codec in BOTH directions") {
    val w = 6; val h = 4
    val rgb = Array.tabulate(w * h * 3)(j => ((11 + j * 5) % 251).toByte)
    // direction 1: our writer, ImageIO's reader
    val jimg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.bmpContainer(w, h, rgb)))
    assert(jimg != null, "ImageIO could not parse our BMP")
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val v = jimg.getRGB(x, y)
      assert(((v >> 16) & 0xff) == (rgb(p) & 0xff) && ((v >> 8) & 0xff) == (rgb(p + 1) & 0xff) &&
        (v & 0xff) == (rgb(p + 2) & 0xff), s"ImageIO disagrees at ($x,$y)")
    }
    // direction 2: ImageIO's writer, our reader
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(p) & 0xff) << 16) | ((rgb(p + 1) & 0xff) << 8) | (rgb(p + 2) & 0xff))
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", baos))
    val im = Multimodal.decodeBmp(baos.toByteArray).getOrElse(fail("decode of ImageIO BMP failed"))
    assert(im.width == w && im.height == h)
    assert(im.pixels.sameElements(rgb))
  }

  test("decodeBmp: malformed headers and short rasters reject to None, never garbage") {
    val good = Multimodal.bmpContainer(4, 3, Array.tabulate(36)(j => j.toByte))
    assert(Multimodal.decodeBmp(good).isDefined)
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(Multimodal.decodeBmp(badMagic).isEmpty)
    val rle = good.clone(); rle(30) = 1 // BI_RLE8
    assert(Multimodal.decodeBmp(rle).isEmpty)
    val v5 = good.clone(); v5(14) = 124 // BITMAPV5HEADER size
    assert(Multimodal.decodeBmp(v5).isEmpty)
    for (cut <- 1 until good.length)
      assert(Multimodal.decodeBmp(java.util.Arrays.copyOf(good, cut)).isEmpty, s"cut=$cut")
    val rnd = new scala.util.Random(43)
    for (_ <- 0 until 2000) {
      val m = good.clone()
      for (_ <- 0 until 1 + rnd.nextInt(4)) m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      Multimodal.decodeBmp(m)
    }
  }

  test("extractFeatures on BMP: tag 9, exact means through the synthetic generator") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val feats = Multimodal.extractFeatures(
        Multimodal.syntheticBmp(df, "id", width = 5, height = 3), dim = 8)
      .select($"id", $"features").collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    def mean(seed: Long, c: Int): Float =
      ((0 until 45).filter(_ % 3 == c).map(j => (seed * 7 + j) % 251).sum / 15.0).toFloat
    assert(feats(1L).take(4) == Seq(9f, 5f, 3f, 24f))
    assert(feats(1L)(4) == mean(1L, 0) && feats(1L)(5) == mean(1L, 1) && feats(1L)(6) == mean(1L, 2))
    assert(feats(1L) != feats(2L))
  }

  // ---- dHash (the l24 perceptual-identity path) ----

  private def blockGray(seed: Long, w: Int, h: Int): Array[Byte] = {
    val g = new Array[Byte](w * h)
    val bx = w / 8
    for (y <- 0 until h; x <- 0 until w) {
      val b = (y / 8) * bx + x / 8
      g(y * w + x) = (((seed * 7 + b) % 251 + 251) % 251).toByte
    }
    g
  }

  test("dHash64: identical pixels re-encoded across codecs hash identically; content changes the hash") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    def hashes(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Multimodal.imageDHash(df.select($"doc_id", $"payload"))
        .select($"doc_id", $"dhash").as[(Long, Long)].collect().toMap
    val viaPpm = hashes(Multimodal.syntheticPpm(docs, "doc_id", 16, 16))
    val viaPng = hashes(Multimodal.syntheticPng(docs, "doc_id", 16, 16))
    assert(viaPpm === viaPng, "same raster, different codec, different hash")
    assert(viaPpm.values.toSet.size === 3, "different content must differ")
  }

  test("dHash64: JPEG-decoded block raster hashes identically to its PNG sibling (the lossy-codec leg)") {
    import graft.operators.Jpeg
    // block-constant 8x8 content is DC-only under the unit quant table,
    // so the lossy path decodes the exact raster — cross-codec identity
    // must survive an actual JPEG encode/decode round trip
    (0L until 8L).foreach { seed =>
      val gray = blockGray(seed, 16, 16)
      val jpeg = Jpeg.encodeGray(16, 16, gray, Jpeg.UnitQuant)
      val rgb = gray.flatMap(v => Array(v, v, v))
      val png = Multimodal.encodePng(16, 16, rgb)
      val hj = Multimodal.dHash64(jpeg)
      val hp = Multimodal.dHash64(png)
      assert(hj.isDefined && hj === hp, s"seed $seed: jpeg $hj vs png $hp")
    }
  }

  test("dHash64: small luma perturbations move the hash only a few Hamming bits") {
    val gray = blockGray(5L, 16, 16)
    val base = Multimodal.dHash64(Multimodal.encodePng(16, 16,
      gray.flatMap(v => Array(v, v, v)))).get
    // nudge ONE 8x8 block by +4 luma: on the 16x16 raster the 9-col
    // grid puts exactly one column boundary (col4|col5) on the block
    // edge, and the bumped block spans grid rows 0-3 — so precisely 4
    // gradient signs flip (the +4 overturns the blocks' natural +1
    // step), nothing else moves: locality is exact, not approximate
    val bumped = gray.clone()
    for (y <- 0 until 8; x <- 0 until 8)
      bumped(y * 16 + x) = (((bumped(y * 16 + x) & 0xff) + 4) min 255).toByte
    val moved = Multimodal.dHash64(Multimodal.encodePng(16, 16,
      bumped.flatMap(v => Array(v, v, v)))).get
    val dist = java.lang.Long.bitCount(base ^ moved)
    assert(dist === 4, s"one-block nudge moved $dist bits (expected the 4 edge flips)")
    // and sign-bit coverage on the l24 ramp fixture (the block fixture
    // never compares across its own top-right block, but the ramp's
    // monotone luma sets bit 63): the 64-bit Hamming band join must be
    // exercised by genuinely negative signatures
    val sigs = (0L until 40L).map { sd =>
      val rgb = Array.tabulate(16 * 16 * 3)(j => (((sd * 7 + j) % 251 + 251) % 251).toByte)
      Multimodal.dHash64(Multimodal.encodePng(16, 16, rgb)).get
    }
    assert(sigs.exists(_ < 0L), "no negative dHash in the l24 fixture — sign-bit leg untested")
  }

  test("mulawCompress: inverts mulawExpand exactly over all 256 codes, and round-trips within one companding step") {
    // expand→compress→expand is the identity on the VALUE space for
    // all 256 codes (code-space identity fails only on 0x7F, μ-law's
    // redundant "negative zero" — the encoder canonicalizes it) ...
    (0 until 256).foreach { c =>
      val b = c.toByte
      val v = Multimodal.mulawExpand(b)
      assert(Multimodal.mulawExpand(Multimodal.mulawCompress(v)) === v,
        s"code $c value $v did not round-trip")
      if (c != 0x7f)
        assert(Multimodal.mulawCompress(v) === b, s"code $c did not round-trip")
    }
    // ... and compress→expand lands within the segment's step size
    Seq[Short](0, 1, -1, 100, -100, 1000, -1000, 8000, -8000, 30000, -30000,
        32767, -32768).foreach { s =>
      val rt = Multimodal.mulawExpand(Multimodal.mulawCompress(s)).toInt
      val step = math.max(8, Integer.highestOneBit(math.min(math.abs(s.toInt), 32635) + 0x84) >> 4)
      assert(math.abs(rt - s) <= step,
        s"sample $s round-tripped to $rt (step $step)")
    }
  }

  test("adpcmEncodeMono: decodes back with bounded error; encoder tracks decoder state bit-for-bit") {
    val s = Multimodal.toneSignal(42L, Multimodal.ToneSamples)
    val enc = Multimodal.adpcmEncodeMono(s, Multimodal.ToneBlockAlign)
    val dec = Multimodal.adpcmDecodeMono(enc, Multimodal.ToneBlockAlign).get
    assert(dec.length === s.length)
    // SNR of the 4-bit predictive quantizer on a tonal signal: the
    // codec tracks within a few steps once locked — mean absolute
    // error well under 2% of full scale
    val mae = s.indices.map(i => math.abs(dec(i) - s(i)).toDouble).sum / s.length
    assert(mae < 600.0, s"ADPCM mean abs error $mae")
    intercept[IllegalArgumentException] { // partial block refused
      Multimodal.adpcmEncodeMono(s.take(100), Multimodal.ToneBlockAlign)
    }
  }

  test("audioFingerprint64: cross-codec re-encodes land within AudioMaxDist; distinct seeds separate; stereo folds") {
    import graft.operators.Dedup
    def fpOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      Multimodal.audioFingerprint(df).select($"doc_id", $"afp")
        .as[(Long, Long)].collect().toMap
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pcm = fpOf(Multimodal.syntheticWavPcm16(ids, "doc_id"))
    val mu = fpOf(Multimodal.syntheticWavMulawTone(ids, "doc_id"))
    val ad = fpOf(Multimodal.syntheticWavAdpcmTone(ids, "doc_id"))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    (1L to 5L).foreach { id =>
      assert(ham(pcm(id), mu(id)) <= Dedup.AudioMaxDist, s"mu $id")
      assert(ham(pcm(id), ad(id)) <= Dedup.AudioMaxDist, s"ad $id")
    }
    for (a <- 1L to 5L; b <- (a + 1) to 5L)
      assert(ham(pcm(a), pcm(b)) > Dedup.AudioMaxDist,
        s"seeds $a/$b collide at ${ham(pcm(a), pcm(b))}")
    // stereo: duplicating the mono channel must not change the
    // fingerprint (channel fold is a mean)
    val mono = Multimodal.toneSignal(7L, Multimodal.ToneSamples)
    def wav16(samples: Array[Short], channels: Int): Array[Byte] = {
      val ascii = java.nio.charset.StandardCharsets.US_ASCII
      def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
      val data = new Array[Byte](samples.length * 2)
      samples.indices.foreach { j =>
        data(2 * j) = (samples(j) & 0xff).toByte
        data(2 * j + 1) = ((samples(j) >> 8) & 0xff).toByte
      }
      "RIFF".getBytes(ascii) ++ le32(4 + 24 + 8 + data.length) ++
        "WAVE".getBytes(ascii) ++ "fmt ".getBytes(ascii) ++ le32(16) ++
        le16(1) ++ le16(channels) ++ le32(8000) ++ le32(8000 * 2 * channels) ++
        le16(2 * channels) ++ le16(16) ++ "data".getBytes(ascii) ++
        le32(data.length) ++ data
    }
    val fMono = Multimodal.audioFingerprint64(wav16(mono, 1)).get
    val stereoSamples = mono.flatMap(x => Array(x, x))
    val fStereo = Multimodal.audioFingerprint64(wav16(stereoSamples, 2)).get
    assert(fMono === fStereo)
    // no-identity paths: not audio, and too short to frame
    assert(Multimodal.audioFingerprint64("RIFFjunk".getBytes).isEmpty)
    assert(Multimodal.audioFingerprint64(wav16(mono.take(200), 1)).isEmpty)
  }

  test("videoFrameHashes64: Y4M and MJPEG of the same block-gray frames hash bit-identically per frame; lossy and None paths") {
    val ids = Seq(3L, 4L).toDF("doc_id")
    def hashes(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Long] =
      Multimodal.videoFrameHashes(df.select($"doc_id", $"payload"))
        .as[(Long, Int, Long)].collect()
        .map { case (id, i, h) => (id, i) -> h }.toMap
    val y4m = hashes(Multimodal.syntheticY4mBlocks(ids, "doc_id", 64, 32, 4))
    val mj = hashes(Multimodal.syntheticAviMjpegBlocks(ids, "doc_id", 64, 32, 4))
    assert(y4m.size === 8 && mj.size === 8)
    // block-constant + unit quant → the JPEG leg decodes exactly → the
    // cross-container frame hashes are IDENTICAL (the l24 PPM/PNG
    // discipline, third modality)
    assert(y4m === mj, "cross-container frame hashes diverged")
    // frames are hash-diverse across (seed, frame)
    assert(y4m.values.toSet.size === 8, s"frame-hash collision: $y4m")
    // the 420 colorspace path hashes the same LUMA as mono would (the
    // existing ramp generator exercises the 420 layout)
    val v420 = Multimodal.videoFrameHashes(
      Multimodal.syntheticY4m(ids, "doc_id", 32, 16, 2)
        .select($"doc_id", $"payload"))
    assert(v420.count() === 4)
    // None paths: not video, and a video whose frames are sub-grid
    assert(Multimodal.videoFrameHashes64("not video".getBytes).isEmpty)
    val tiny = Multimodal.syntheticY4m(Seq(1L).toDF("doc_id"), "doc_id", 8, 8, 1)
      .select($"payload").collect()(0).getAs[Array[Byte]](0)
    assert(Multimodal.videoFrameHashes64(tiny).isEmpty)
  }

  test("dHash64: undecodable and sub-grid payloads yield None / null column, never garbage") {
    assert(Multimodal.dHash64("not an image".getBytes).isEmpty)
    assert(Multimodal.dHash64(ppm(4, 4, Array.fill(48)(7))).isEmpty, "sub-9x8 raster must have no hash")
    val out = Multimodal.imageDHash(
      Seq((1L, "junk".getBytes)).toDF("doc_id", "payload"))
      .select($"dhash").collect()
    assert(out.head.isNullAt(0))
  }
}
