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

  test("unknown formats fall back to the deterministic stub, same dim") {
    val df = Seq((1L, "not an image at all".getBytes)).toDF("id", "payload")
    val f1 = Multimodal.extractFeatures(df, dim = 8).select($"features").collect().head.getSeq[Float](0)
    val f2 = Multimodal.extractFeatures(df, dim = 8).select($"features").collect().head.getSeq[Float](0)
    assert(f1.size == 8 && f1 == f2)
  }
}
