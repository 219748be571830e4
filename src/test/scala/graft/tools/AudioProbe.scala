package graft.tools

import graft.operators.Multimodal

/** Scratch diagnostic: Hamming distances of the audio fingerprint
  * across codec re-encodes, over a seed range — the calibration behind
  * the l28 contract's maxDist. */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    def fp(payload: Array[Byte]): Long =
      Multimodal.audioFingerprint64(payload).getOrElse(sys.error("no fp"))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val m = classOf[Multimodal.type]
    val _ = m
    var maxMu = 0; var maxAd = 0; var maxMuAd = 0
    val sigs = scala.collection.mutable.ArrayBuffer.empty[Long]
    for (seed <- 0L until 5000L) {
      val s = Multimodal.toneSignal(seed, Multimodal.ToneSamples)
      val pcm = encodePcm(s)
      val mu = encodeMu(s)
      val ad = encodeAd(s)
      val (fPcm, fMu, fAd) = (fp(pcm), fp(mu), fp(ad))
      maxMu = math.max(maxMu, ham(fPcm, fMu))
      maxAd = math.max(maxAd, ham(fPcm, fAd))
      maxMuAd = math.max(maxMuAd, ham(fMu, fAd))
      sigs += fPcm
    }
    println(s"[audioprobe] max dist pcm-mulaw=$maxMu pcm-adpcm=$maxAd mulaw-adpcm=$maxMuAd")
    // cross-seed separation: min distance between DIFFERENT seeds
    var minCross = 64
    var nDup = 0
    for (i <- sigs.indices; j <- (i + 1) until sigs.length) {
      val d = ham(sigs(i), sigs(j))
      if (d < minCross) minCross = d
      if (d == 0) nDup += 1
    }
    println(s"[audioprobe] distinct-seed min dist=$minCross zero-dist pairs=$nDup of ${sigs.length * (sigs.length - 1) / 2}")
  }

  private def encodePcm(s: Array[Short]): Array[Byte] = wav(1, 2, 16,
    { val d = new Array[Byte](s.length * 2)
      var j = 0
      while (j < s.length) {
        d(2 * j) = (s(j) & 0xff).toByte; d(2 * j + 1) = ((s(j) >> 8) & 0xff).toByte
        j += 1 }
      d })
  private def encodeMu(s: Array[Short]): Array[Byte] =
    wav(7, 1, 8, s.map(Multimodal.mulawCompress))
  private def encodeAd(s: Array[Short]): Array[Byte] =
    wav(0x11, Multimodal.ToneBlockAlign, 4,
      Multimodal.adpcmEncodeMono(s, Multimodal.ToneBlockAlign))
  private def wav(fmt: Int, blockAlign: Int, bps: Int, data: Array[Byte]): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val pad = data.length & 1
    "RIFF".getBytes(ascii) ++ le32(4 + 24 + 8 + data.length + pad) ++
      "WAVE".getBytes(ascii) ++ "fmt ".getBytes(ascii) ++ le32(16) ++
      le16(fmt) ++ le16(1) ++ le32(8000) ++ le32(8000 * blockAlign) ++
      le16(blockAlign) ++ le16(bps) ++
      "data".getBytes(ascii) ++ le32(data.length) ++ data ++
      (if (pad == 1) Array(0.toByte) else Array.empty[Byte])
  }
}
