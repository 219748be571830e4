package graft.operators

/** JPEG codec written from the public ITU-T T.81 specification
  * (the L8 compressed-image modality — the same honesty contract as
  * [[Multimodal.decodePng]]: real parsing, `None` — never garbage — for
  * anything outside the supported envelope; unsupported files fall to the
  * quarantined stub).
  *
  * Decoder envelope: baseline sequential DCT (SOF0/SOF1) AND progressive
  * DCT (SOF2, T.81 Annex G: spectral selection + successive approximation,
  * DC and AC refinement scans, EOB runs), 8-bit samples, Huffman entropy
  * coding, 1 (grayscale) or 3 (JFIF YCbCr) components, sampling factors
  * 1 or 2 per axis (so 4:4:4 / 4:2:2 / 4:2:0), restart markers, FF00 byte
  * stuffing. Chroma upsampling is nearest-neighbor replication; the IDCT
  * runs in double precision (the spec leaves IDCT rounding
  * implementation-defined — the cross-check against the JDK's independent
  * decoder in MultimodalSpec allows the documented ±2). Arithmetic
  * coding, 12-bit, lossless, hierarchical and 4-component (CMYK) streams
  * return None.
  *
  * Encoder (test-fixture side, like [[Multimodal.encodePng]]): baseline,
  * 4:4:4 (or single-component gray), caller-supplied quantization tables,
  * simple flat canonical Huffman tables (all DC symbols at 4 bits, all
  * 162 AC symbols at 8 bits — valid per T.81, chosen for simplicity over
  * compression), optional restart interval. With an all-ones quant table
  * and per-block-constant rasters the DCT round trip is EXACT (only the
  * DC coefficient survives, integer-scaled by 8) — which is what makes a
  * lossy codec oracle-checkable (`l08d_jpeg_decode`). A progressive
  * encoder variant emits a fixture script with a DC-first scan at point
  * transform 1, a DC refinement scan, and per-component AC bands —
  * exercising both Annex G tools on oracle-checkable synthetic data
  * (`l08g_progressive_decode`).
  */
private[graft] object Jpeg {

  final case class Decoded(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  /** Natural (row-major) index of the i-th coefficient in zigzag order. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosT(x)(u) = C(u) * cos((2x+1)·u·π/16) — shared by FDCT and IDCT. */
  private val cosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16) * (if (u == 0) 1 / math.sqrt(2.0) else 1.0)
  }

  private final class Malformed extends RuntimeException

  // ---------------------------------------------------------------- decode

  private final class Huff(bits: Array[Int], val vals: Array[Int]) {
    // canonical code tables per T.81 F.2.2.3 (mincode/maxcode/valptr)
    val mincode = new Array[Int](17)
    val maxcode = Array.fill(17)(-1)
    val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valptr(l) = k
          mincode(l) = code
          code += bits(l); k += bits(l)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
      if (k != vals.length) throw new Malformed
    }
  }

  /** Bit reader over the entropy-coded segment: FF00 unstuffing; any
    * other marker encountered while bits are still needed is a truncated
    * scan (Malformed → None). Restart markers are consumed byte-aligned
    * between restart intervals, never mid-bit. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var cur = 0
    private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        val v = b(pos) & 0xff
        if (v == 0xff) {
          if ((b(pos + 1) & 0xff) != 0x00) throw new Malformed // marker mid-scan
          pos += 2
        } else pos += 1
        cur = v; cnt = 8
      }
      cnt -= 1
      (cur >>> cnt) & 1
    }
    def receive(s: Int): Int = {
      var v = 0; var i = 0
      while (i < s) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def align(): Unit = cnt = 0
    def consumeRst(idx: Int): Boolean =
      (b(pos) & 0xff) == 0xff && (b(pos + 1) & 0xff) == (0xd0 + idx) && { pos += 2; true }
  }

  private def decodeHuff(t: Huff, br: BitReader): Int = {
    var code = 0
    var l = 1
    while (l <= 16) {
      code = (code << 1) | br.bit()
      if (t.maxcode(l) >= 0 && code <= t.maxcode(l))
        return t.vals(t.valptr(l) + code - t.mincode(l))
      l += 1
    }
    throw new Malformed
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** In-place 2-D IDCT (two separable 1-D passes, each ×1/2). */
  private def idct(blk: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // horizontal pass per row v: over frequency u → space x
      var x = 0
      while (x < 8) {
        var s = 0.0; var u = 0
        while (u < 8) { s += cosT(x)(u) * blk(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = 0.5 * s
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) { // vertical pass per column x: over frequency v → space y
      var x = 0
      while (x < 8) {
        var s = 0.0; var vv = 0
        while (vv < 8) { s += cosT(y)(vv) * tmp(vv * 8 + x); vv += 1 }
        blk(y * 8 + x) = 0.5 * s
        x += 1
      }
      y += 1
    }
  }

  private def clamp(v: Long): Int = if (v < 0) 0 else if (v > 255) 255 else v.toInt

  private final case class Comp(id: Int, h: Int, v: Int, tq: Int) {
    var td = 0; var ta = 0 // Huffman table ids, set by SOS
  }

  def decode(bytes: Array[Byte]): Option[Decoded] =
    try decodeImpl(bytes)
    catch {
      // malformed/truncated input funnels to None — the Option contract;
      // bounds violations on truncated buffers are part of that funnel
      case _: Malformed => None
      case _: ArrayIndexOutOfBoundsException => None
      case _: NegativeArraySizeException => None
    }

  private def decodeImpl(bytes: Array[Byte]): Option[Decoded] = {
    if (bytes.length < 4 || (bytes(0) & 0xff) != 0xff || (bytes(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    def u8(): Int = { val v = bytes(pos) & 0xff; pos += 1; v }
    def u16(): Int = { val v = ((bytes(pos) & 0xff) << 8) | (bytes(pos + 1) & 0xff); pos += 2; v }
    val qt = new Array[Array[Int]](4)
    val dcT = new Array[Huff](4)
    val acT = new Array[Huff](4)
    var comps: Array[Comp] = null
    var width = 0; var height = 0
    var dri = 0
    // progressive state: per-component coefficient store (zigzag order per
    // block, over the MCU-padded block grid), filled scan by scan
    var progressive = false
    var coefs: Array[Array[Int]] = null
    var coefBw: Array[Int] = null
    var coefBh: Array[Int] = null
    var hmax = 0; var vmax = 0; var mcusX = 0; var mcusY = 0
    var anyScan = false
    while (true) {
      if (u8() != 0xff) return None // markers must be back-to-back at this level
      var code = u8()
      while (code == 0xff) code = u8() // fill bytes
      code match {
        case 0xdb => // DQT — one or more tables
          var left = u16() - 2
          while (left > 0) {
            val pqtq = u8()
            if ((pqtq >> 4) != 0) return None // 16-bit tables aren't baseline
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = u8(); i += 1 } // zigzag order, per spec
            qt(pqtq & 0x0f) = t
            left -= 65
          }
          if (left != 0) return None
        case 0xc4 => // DHT — one or more tables
          var left = u16() - 2
          while (left > 0) {
            val tcth = u8()
            val bits = new Array[Int](17)
            var n = 0
            var l = 1
            while (l <= 16) { bits(l) = u8(); n += bits(l); l += 1 }
            if (n > 256) return None
            val vals = new Array[Int](n)
            var i = 0
            while (i < n) { vals(i) = u8(); i += 1 }
            val h = new Huff(bits, vals)
            if ((tcth >> 4) == 0) dcT(tcth & 0x0f) = h else acT(tcth & 0x0f) = h
            left -= 1 + 16 + n
          }
          if (left != 0) return None
        case 0xc0 | 0xc1 | 0xc2 => // SOF0/SOF1 baseline/extended, SOF2 progressive
          if (comps != null) return None
          progressive = code == 0xc2
          val len = u16()
          if (u8() != 8) return None // 12-bit precision is out of envelope
          height = u16(); width = u16()
          val nf = u8()
          if (len != 8 + 3 * nf) return None
          if (width <= 0 || height <= 0 || width > 100000000 || height > 100000000)
            return None // same dimension bound as decodePpm/decodePng
          if (width.toLong * height > (1L << 26))
            return None // total-pixel cap: a few header bytes must not force a GB-scale plane allocation
          if (progressive && width.toLong * height > (1L << 24))
            return None // progressive holds full-frame Int coefficients (4 B/coeff) until EOI
          if (nf != 1 && nf != 3) return None // CMYK/unknown color models
          comps = Array.fill(nf)(null)
          var i = 0
          while (i < nf) {
            val id = u8(); val hv = u8(); val tq = u8()
            val ch = hv >> 4; val cv = hv & 0x0f
            if (ch < 1 || ch > 2 || cv < 1 || cv > 2) return None
            comps(i) = Comp(id, ch, cv, tq)
            i += 1
          }
          hmax = comps.map(_.h).max; vmax = comps.map(_.v).max
          mcusX = (width + 8 * hmax - 1) / (8 * hmax)
          mcusY = (height + 8 * vmax - 1) / (8 * vmax)
          if (progressive) {
            coefBw = comps.map(c => mcusX * c.h)
            coefBh = comps.map(c => mcusY * c.v)
            coefs = comps.indices.toArray.map(i =>
              new Array[Int](coefBw(i) * coefBh(i) * 64))
          }
        case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
          return None // lossless/arithmetic/hierarchical frames
        case 0xdd => // DRI
          if (u16() != 4) return None
          dri = u16()
        case 0xd9 => // EOI: ends a progressive frame; premature otherwise
          return if (progressive && anyScan)
            finishProgressive(width, height, comps, qt, coefs, coefBw, coefBh)
          else None
        case 0xda => // SOS
          if (comps == null) return None
          val len = u16()
          val ns = u8()
          if (ns < 1 || ns > comps.length || len != 6 + 2 * ns) return None
          val scanIdx = new Array[Int](ns)
          var i = 0
          while (i < ns) {
            val cs = u8(); val tdta = u8()
            val ci = comps.indexWhere(_.id == cs)
            if (ci < 0) return None
            comps(ci).td = tdta >> 4; comps(ci).ta = tdta & 0x0f
            scanIdx(i) = ci
            i += 1
          }
          val ss = u8(); val se = u8(); val ahal = u8()
          if (!progressive) {
            // baseline: single interleaved scan, spectral selection
            // 0..63, no successive approximation — then done
            if (ns != comps.length || ss != 0 || se != 63 || ahal != 0) return None
            return decodeScan(bytes, pos, width, height, comps, qt, dcT, acT, dri)
          }
          // progressive scan constraints (T.81 G.1): DC scans are
          // Ss=Se=0 and may interleave; AC scans are single-component
          // bands within 1..63; a refinement lowers the point transform
          // by exactly one
          val ah = ahal >> 4; val al = ahal & 0x0f
          if (ss == 0 && se != 0) return None
          if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
          if (al > 13 || ah > 13 || (ah > 0 && al != ah - 1)) return None
          pos = decodeProgressiveScan(bytes, pos, comps, scanIdx, coefs, coefBw,
            dcT, acT, mcusX, mcusY, hmax, vmax, width, height, ss, se, ah, al, dri)
          anyScan = true
        case _ => // APPn / COM / other length-prefixed segments: skip
          val len = u16()
          if (len < 2) return None
          pos += len - 2
      }
    }
    None // unreachable
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int, width: Int,
      height: Int, comps: Array[Comp], qt: Array[Array[Int]],
      dcT: Array[Huff], acT: Array[Huff], dri: Int): Option[Decoded] = {
    val hmax = comps.map(_.h).max
    val vmax = comps.map(_.v).max
    val mcusX = (width + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (height + 8 * vmax - 1) / (8 * vmax)
    // per-component padded sample planes (MCU-aligned; cropped on output)
    val planes = comps.map(c => new Array[Byte](mcusX * c.h * 8 * mcusY * c.v * 8))
    val planeW = comps.map(c => mcusX * c.h * 8)
    comps.foreach { c =>
      if (qt(c.tq) == null || dcT(c.td) == null || acT(c.ta) == null)
        return None // table referenced before being defined
    }
    val br = new BitReader(bytes, scanStart)
    val preds = new Array[Int](comps.length)
    val zz = new Array[Int](64)
    val blk = new Array[Double](64)
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          br.align()
          if (!br.consumeRst(rstIdx)) return None
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          val q = qt(c.tq)
          var bj = 0
          while (bj < c.v) {
            var bi = 0
            while (bi < c.h) {
              // --- decode one block: DC diff + AC run-lengths (F.2.2) ---
              java.util.Arrays.fill(zz, 0)
              val s0 = decodeHuff(dcT(c.td), br)
              if (s0 > 11) throw new Malformed
              preds(ci) += extend(br.receive(s0), s0)
              zz(0) = preds(ci)
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = decodeHuff(acT(c.ta), br)
                val r = rs >> 4; val s = rs & 0x0f
                if (s == 0) {
                  if (r == 15) k += 16 else eob = true // ZRL / EOB
                } else {
                  k += r
                  if (k > 63) throw new Malformed
                  zz(k) = extend(br.receive(s), s)
                  k += 1
                }
              }
              // --- dequantize (tables are in zigzag order too) + IDCT ---
              var i = 0
              while (i < 64) { blk(ZigZag(i)) = zz(i).toDouble * q(i); i += 1 }
              idct(blk)
              val plane = planes(ci); val pw = planeW(ci)
              val x0 = (mx * c.h + bi) * 8; val y0 = (my * c.v + bj) * 8
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) {
                  plane((y0 + y) * pw + x0 + x) =
                    clamp(Math.round(blk(y * 8 + x) + 128.0)).toByte
                  x += 1
                }
                y += 1
              }
              bi += 1
            }
            bj += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    // scan must be followed by EOI (possibly after fill bytes)
    br.align()
    var p = br.pos
    while (p + 1 < bytes.length && (bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xff) == 0xff)
      p += 1
    if (p + 1 >= bytes.length || (bytes(p) & 0xff) != 0xff || (bytes(p + 1) & 0xff) != 0xd9)
      return None
    assemble(width, height, comps, planes, planeW, hmax, vmax)
  }

  /** Shared output assembly: replicate-upsample chroma, crop MCU
    * padding, color-convert (JFIF YCbCr → RGB). */
  private def assemble(width: Int, height: Int, comps: Array[Comp],
      planes: Array[Array[Byte]], planeW: Array[Int],
      hmax: Int, vmax: Int): Option[Decoded] = {
    if (comps.length == 1) {
      val out = new Array[Byte](width * height)
      val pw = planeW(0)
      var y = 0
      while (y < height) {
        System.arraycopy(planes(0), y * pw, out, y * width, width)
        y += 1
      }
      Some(Decoded(width, height, 1, out))
    } else {
      val out = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          def sample(ci: Int): Int = {
            val c = comps(ci)
            planes(ci)((y * c.v / vmax) * planeW(ci) + x * c.h / hmax) & 0xff
          }
          val yy = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp(Math.round(yy + 1.402 * cr)).toByte
          out(o + 1) = clamp(Math.round(yy - 0.344136 * cb - 0.714136 * cr)).toByte
          out(o + 2) = clamp(Math.round(yy + 1.772 * cb)).toByte
          x += 1
        }
        y += 1
      }
      Some(Decoded(width, height, 3, out))
    }
  }

  // ---------------------------------------------- progressive (Annex G)

  /** Decode one progressive scan into the coefficient store; returns the
    * (aligned) position just past the scan's entropy data. Interleaved
    * scans (ns > 1, DC-only per the SOS validation) iterate the frame's
    * MCU grid — padding blocks are coded; non-interleaved scans iterate
    * the component's OWN block grid (ceil of its scaled dimensions), and
    * the restart interval counts blocks there, not MCUs. */
  private def decodeProgressiveScan(bytes: Array[Byte], start: Int,
      comps: Array[Comp], scanIdx: Array[Int], coefs: Array[Array[Int]],
      coefBw: Array[Int], dcT: Array[Huff], acT: Array[Huff],
      mcusX: Int, mcusY: Int, hmax: Int, vmax: Int,
      width: Int, height: Int,
      ss: Int, se: Int, ah: Int, al: Int, dri: Int): Int = {
    val br = new BitReader(bytes, start)
    val preds = new Array[Int](comps.length)
    var eobrun = 0
    var rstIdx = 0
    // a DC-first scan needs its DC tables; refinement DC scans read raw
    // bits; AC scans (first or refinement) need the AC table
    if (ss == 0 && ah == 0)
      scanIdx.foreach(ci => if (dcT(comps(ci).td) == null) throw new Malformed)
    if (ss > 0 && acT(comps(scanIdx(0)).ta) == null) throw new Malformed

    def dcUnit(ci: Int, off: Int): Unit =
      if (ah == 0) {
        val s0 = decodeHuff(dcT(comps(ci).td), br)
        if (s0 > 11) throw new Malformed
        preds(ci) += extend(br.receive(s0), s0)
        coefs(ci)(off) = preds(ci) << al
      } else {
        // DC refinement: one raw bit ORs into the next-lower bit plane
        if (br.bit() == 1) coefs(ci)(off) |= (1 << al)
      }

    def restart(): Unit = {
      br.align()
      if (!br.consumeRst(rstIdx)) throw new Malformed
      rstIdx = (rstIdx + 1) % 8
      java.util.Arrays.fill(preds, 0)
      eobrun = 0
    }

    if (scanIdx.length > 1) {
      // interleaved DC scan over the frame MCU grid
      var mcu = 0
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          if (dri > 0 && mcu > 0 && mcu % dri == 0) restart()
          var si = 0
          while (si < scanIdx.length) {
            val ci = scanIdx(si); val c = comps(ci)
            var bj = 0
            while (bj < c.v) {
              var bi = 0
              while (bi < c.h) {
                dcUnit(ci, ((my * c.v + bj) * coefBw(ci) + mx * c.h + bi) * 64)
                bi += 1
              }
              bj += 1
            }
            si += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } else {
      // non-interleaved: the component's own block grid
      val ci = scanIdx(0); val c = comps(ci)
      val cbw = ((width * c.h + hmax - 1) / hmax + 7) / 8
      val cbh = ((height * c.v + vmax - 1) / vmax + 7) / 8
      val arr = coefs(ci); val bwFull = coefBw(ci)
      var blkN = 0
      var by = 0
      while (by < cbh) {
        var bx = 0
        while (bx < cbw) {
          if (dri > 0 && blkN > 0 && blkN % dri == 0) restart()
          val off = (by * bwFull + bx) * 64
          if (ss == 0) dcUnit(ci, off)
          else if (ah == 0) eobrun = acFirst(arr, off, br, acT(c.ta), ss, se, al, eobrun)
          else eobrun = acRefine(arr, off, br, acT(c.ta), ss, se, al, eobrun)
          blkN += 1
          bx += 1
        }
        by += 1
      }
    }
    br.align()
    br.pos
  }

  /** First AC scan of a band (Ah=0, T.81 G.2.2): run-lengths, EOB runs,
    * values point-transformed up by Al. Returns the remaining EOB run. */
  private def acFirst(arr: Array[Int], off: Int, br: BitReader, ac: Huff,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    if (eobrunIn > 0) return eobrunIn - 1 // block entirely inside an EOB run
    var k = ss
    while (k <= se) {
      val rs = decodeHuff(ac, br)
      val r = rs >> 4; val s = rs & 0x0f
      if (s == 0) {
        if (r < 15) { // EOBn: run of (1<<r) + next-r-bits end-of-bands
          var eobrun = (1 << r) - 1
          if (r > 0) eobrun += br.receive(r)
          return eobrun
        }
        k += 16 // ZRL
      } else {
        k += r
        if (k > se) throw new Malformed
        arr(off + k) = extend(br.receive(s), s) << al
        k += 1
      }
    }
    0
  }

  /** AC refinement scan (Ah>0, T.81 G.2.3): each symbol either places a
    * new ±1 at bit plane Al or extends an EOB run; every NONZERO history
    * coefficient traversed — including the tail covered by an EOB run —
    * consumes one correction bit that may append the Al bit to its
    * magnitude. Returns the remaining EOB run. */
  private def acRefine(arr: Array[Int], off: Int, br: BitReader, ac: Huff,
      ss: Int, se: Int, al: Int, eobrunIn: Int): Int = {
    val p1 = 1 << al
    var eobrun = eobrunIn
    var k = ss
    def correct(idx: Int): Unit = {
      val cur = arr(idx)
      if (br.bit() == 1 && (cur & p1) == 0)
        arr(idx) = if (cur > 0) cur + p1 else cur - p1
    }
    if (eobrun == 0) {
      var done = false
      while (k <= se && !done) {
        val rs = decodeHuff(ac, br)
        var r = rs >> 4; val s = rs & 0x0f
        var newVal = 0
        if (s == 0) {
          if (r < 15) { // EOBn — the run INCLUDES this block: even a
            // bare EOB (run 1) still owes correction bits for the
            // remaining nonzero history in the band (the tail below)
            eobrun = 1 << r
            if (r > 0) eobrun += br.receive(r)
            done = true
          }
          // r == 15 (ZRL): skip 16 zero-HISTORY positions, refining any
          // nonzero coefficients passed on the way
        } else {
          if (s != 1) throw new Malformed // refinement places only ±1
          newVal = if (br.bit() == 1) p1 else -p1
        }
        if (!done) {
          var placed = false
          while (k <= se && !placed) {
            if (arr(off + k) != 0) correct(off + k)
            else if (r == 0) {
              if (s != 0) arr(off + k) = newVal
              placed = true // for ZRL this consumes the 16th zero slot
            } else r -= 1
            k += 1
          }
        }
      }
    }
    // a block covered by an EOB run (decoded above or entered with) owes
    // correction bits for every nonzero history coefficient left in the
    // band, then consumes one run unit
    if (eobrun > 0) {
      while (k <= se) {
        if (arr(off + k) != 0) correct(off + k)
        k += 1
      }
      eobrun -= 1
    }
    eobrun
  }

  /** EOI of a progressive frame: dequantize the accumulated coefficients,
    * IDCT every block of the (MCU-padded) grid, assemble like baseline. */
  private def finishProgressive(width: Int, height: Int, comps: Array[Comp],
      qt: Array[Array[Int]], coefs: Array[Array[Int]], coefBw: Array[Int],
      coefBh: Array[Int]): Option[Decoded] = {
    comps.foreach(c => if (qt(c.tq) == null) return None)
    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    val planes = comps.indices.toArray.map(i =>
      new Array[Byte](coefBw(i) * 8 * coefBh(i) * 8))
    val planeW = comps.indices.toArray.map(coefBw(_) * 8)
    val blk = new Array[Double](64)
    var ci = 0
    while (ci < comps.length) {
      val q = qt(comps(ci).tq); val arr = coefs(ci)
      val bw = coefBw(ci); val bh = coefBh(ci)
      val plane = planes(ci); val pw = planeW(ci)
      var by = 0
      while (by < bh) {
        var bx = 0
        while (bx < bw) {
          val off = (by * bw + bx) * 64
          var i = 0
          while (i < 64) { blk(ZigZag(i)) = arr(off + i).toDouble * q(i); i += 1 }
          idct(blk)
          val x0 = bx * 8; val y0 = by * 8
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              plane((y0 + y) * pw + x0 + x) =
                clamp(Math.round(blk(y * 8 + x) + 128.0)).toByte
              x += 1
            }
            y += 1
          }
          bx += 1
        }
        by += 1
      }
      ci += 1
    }
    assemble(width, height, comps, planes, planeW, hmax, vmax)
  }

  // ---------------------------------------------------------------- encode

  /** ITU T.81 Annex K.1 example quantization tables (the de-facto
    * "quality 50" tables), natural order. */
  val AnnexKLuma: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)
  val AnnexKChroma: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99)
  val UnitQuant: Array[Int] = Array.fill(64)(1)

  // flat canonical Huffman tables: DC categories 0..11 all at 4 bits,
  // the 162 AC symbols (EOB, ZRL, (run,size) for size 1..10) all at
  // 8 bits — canonical, incomplete (unused codes never emitted), valid
  private val dcBits: Array[Int] = { val a = new Array[Int](17); a(4) = 12; a }
  private val dcVals: Array[Int] = (0 to 11).toArray
  private val acBits: Array[Int] = { val a = new Array[Int](17); a(8) = 162; a }
  private val acVals: Array[Int] =
    Array(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)

  private def codeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val out = scala.collection.mutable.Map[Int, (Int, Int)]()
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { out(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    out.toMap
  }
  private lazy val dcCodes = codeTable(dcBits, dcVals)
  private lazy val acCodes = codeTable(acBits, acVals)

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var cur = 0
    private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        cur = (cur << 1) | ((code >>> i) & 1)
        cnt += 1
        if (cnt == 8) {
          out.write(cur)
          if (cur == 0xff) out.write(0x00) // byte stuffing
          cur = 0; cnt = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (cnt > 0) { // pad with 1-bits per spec
      put((1 << (8 - cnt)) - 1, 8 - cnt)
    }
  }

  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  private def fdct(blk: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) { // horizontal: space x → frequency u
      var u = 0
      while (u < 8) {
        var s = 0.0; var x = 0
        while (x < 8) { s += cosT(x)(u) * blk(v * 8 + x); x += 1 }
        tmp(v * 8 + u) = 0.5 * s
        u += 1
      }
      v += 1
    }
    var u = 0
    while (u < 8) { // vertical: space y → frequency v
      var vv = 0
      while (vv < 8) {
        var s = 0.0; var y = 0
        while (y < 8) { s += cosT(y)(vv) * tmp(y * 8 + u); y += 1 }
        blk(vv * 8 + u) = 0.5 * s
        vv += 1
      }
      u += 1
    }
  }

  /** FDCT + quantize (natural-order table) into zigzag-order ints. */
  private def quantizedZigzag(blk: Array[Double], quant: Array[Int]): Array[Int] = {
    fdct(blk)
    val zz = new Array[Int](64)
    var i = 0
    while (i < 64) {
      val nat = ZigZag(i)
      zz(i) = Math.round(blk(nat) / quant(nat)).toInt
      i += 1
    }
    zz
  }

  private def emitDc(bw: BitWriter, diff: Int): Unit = {
    val s = category(diff)
    val (dc, dl) = dcCodes(s)
    bw.put(dc, dl)
    if (s > 0) bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
  }

  /** Quantize (natural-order table), zigzag, Huffman-encode one block;
    * returns the new DC predictor. */
  private def encodeBlock(blk: Array[Double], quant: Array[Int], pred: Int,
      bw: BitWriter): Int = {
    val zz = quantizedZigzag(blk, quant)
    emitDc(bw, zz(0) - pred)
    var k = 1
    var run = 0
    while (k < 64) {
      if (zz(k) == 0) run += 1
      else {
        while (run > 15) { val (c, l) = acCodes(0xf0); bw.put(c, l); run -= 16 }
        val sz = category(zz(k))
        val (c, l) = acCodes((run << 4) | sz)
        bw.put(c, l)
        bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (c, l) = acCodes(0x00); bw.put(c, l) } // EOB
    zz(0)
  }

  /** Extract one level-shifted 8×8 block from a single-channel plane,
    * replicating edge samples into MCU padding. */
  private def loadBlock(plane: Array[Double], w: Int, h: Int, x0: Int, y0: Int,
      blk: Array[Double]): Unit = {
    var y = 0
    while (y < 8) {
      val sy = math.min(y0 + y, h - 1)
      var x = 0
      while (x < 8) {
        val sx = math.min(x0 + x, w - 1)
        blk(y * 8 + x) = plane(sy * w + sx) - 128.0
        x += 1
      }
      y += 1
    }
  }

  private def writeSegment(out: java.io.ByteArrayOutputStream, marker: Int,
      body: Array[Int]): Unit = {
    out.write(0xff); out.write(marker)
    val len = body.length + 2
    out.write(len >> 8); out.write(len & 0xff)
    body.foreach(out.write)
  }

  /** Shared header + per-plane scan encoding. `planes` are full-resolution
    * (4:4:4) single-channel rasters; 1 plane = grayscale, 3 = YCbCr. */
  private def encodePlanes(width: Int, height: Int, planes: Array[Array[Double]],
      quants: Array[Array[Int]], restartInterval: Int): Array[Byte] = {
    require(planes.length == 1 || planes.length == 3)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    // JFIF APP0 (identifies 3-component data as YCbCr to any decoder)
    writeSegment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    quants.zipWithIndex.foreach { case (q, ti) => // DQT, zigzag order
      writeSegment(out, 0xdb, ti +: Array.tabulate(64)(i => q(ZigZag(i))))
    }
    val nf = planes.length
    // SOF0: all components 1x1 sampling (4:4:4); component i uses quant
    // table min(i, quants-1) (luma + shared chroma)
    val sof = Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff, nf) ++
      (0 until nf).flatMap(i => Array(i + 1, 0x11, math.min(i, quants.length - 1)))
    writeSegment(out, 0xc0, sof)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      writeSegment(out, 0xc4, ((tc << 4) | th) +: (bits.drop(1) ++ vals))
    dht(0, 0, dcBits, dcVals); dht(1, 0, acBits, acVals)
    if (nf == 3) { dht(0, 1, dcBits, dcVals); dht(1, 1, acBits, acVals) }
    if (restartInterval > 0)
      writeSegment(out, 0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    // SOS: component i → DC/AC table pair min(i, 1)
    writeSegment(out, 0xda, nf +: ((0 until nf).flatMap { i =>
      val t = math.min(i, 1); Array(i + 1, (t << 4) | t)
    }.toArray ++ Array(0, 63, 0)))
    val bw = new BitWriter(out)
    val preds = new Array[Int](nf)
    val blk = new Array[Double](64)
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    var rstIdx = 0
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          out.write(0xff); out.write(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          java.util.Arrays.fill(preds, 0)
        }
        var ci = 0
        while (ci < nf) {
          loadBlock(planes(ci), width, height, mx * 8, my * 8, blk)
          preds(ci) = encodeBlock(blk, quants(math.min(ci, quants.length - 1)), preds(ci), bw)
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive (SOF2) sibling of [[encodePlanes]] — fixture-grade,
    * 4:4:4/gray, no restart markers. The scan script exercises BOTH
    * Annex G tools: an interleaved DC-first scan at point transform 1,
    * a DC refinement scan down to 0, then per-component AC bands 1..5
    * and 6..63 at Al=0 (spectral selection). Coefficients are identical
    * to what the baseline encoder would emit, so on block-constant
    * rasters under a unit quant table the decode is EXACT — the same
    * property that makes `l08d` oracle-checkable carries to `l08g`. */
  private def encodePlanesProgressive(width: Int, height: Int,
      planes: Array[Array[Double]], quants: Array[Array[Int]]): Array[Byte] = {
    require(planes.length == 1 || planes.length == 3)
    val nf = planes.length
    val mcusX = (width + 7) / 8
    val mcusY = (height + 7) / 8
    // quantize everything up front: progressive scans revisit the same
    // blocks by band/bit-plane
    val blk = new Array[Double](64)
    val coefs = Array.ofDim[Array[Int]](nf, mcusX * mcusY)
    var ci = 0
    while (ci < nf) {
      val q = quants(math.min(ci, quants.length - 1))
      var my = 0
      while (my < mcusY) {
        var mx = 0
        while (mx < mcusX) {
          loadBlock(planes(ci), width, height, mx * 8, my * 8, blk)
          coefs(ci)(my * mcusX + mx) = quantizedZigzag(blk, q)
          mx += 1
        }
        my += 1
      }
      ci += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    writeSegment(out, 0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    quants.zipWithIndex.foreach { case (q, ti) =>
      writeSegment(out, 0xdb, ti +: Array.tabulate(64)(i => q(ZigZag(i))))
    }
    val sof = Array(8, height >> 8, height & 0xff, width >> 8, width & 0xff, nf) ++
      (0 until nf).flatMap(i => Array(i + 1, 0x11, math.min(i, quants.length - 1)))
    writeSegment(out, 0xc2, sof) // SOF2
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Unit =
      writeSegment(out, 0xc4, ((tc << 4) | th) +: (bits.drop(1) ++ vals))
    dht(0, 0, dcBits, dcVals); dht(1, 0, acBits, acVals)
    if (nf == 3) { dht(0, 1, dcBits, dcVals); dht(1, 1, acBits, acVals) }
    def sos(compIdx: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit =
      writeSegment(out, 0xda, compIdx.length +: (compIdx.flatMap { i =>
        val t = math.min(i, 1); Array(i + 1, (t << 4) | t)
      }.toArray ++ Array(ss, se, (ah << 4) | al)))

    // scan 1: DC first, all components interleaved, Al=1 (arithmetic
    // shift — safe for negatives because the decoder ORs the refinement
    // bit into the <<1-cleared low plane)
    sos(0 until nf, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(out)
      val preds = new Array[Int](nf)
      var b = 0
      while (b < mcusX * mcusY) {
        var c = 0
        while (c < nf) {
          val dc = coefs(c)(b)(0) >> 1
          emitDc(bw, dc - preds(c))
          preds(c) = dc
          c += 1
        }
        b += 1
      }
      bw.flush()
    }
    // scan 2: DC refinement to Al=0 — one raw bit per block
    sos(0 until nf, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(out)
      var b = 0
      while (b < mcusX * mcusY) {
        var c = 0
        while (c < nf) { bw.put(coefs(c)(b)(0) & 1, 1); c += 1 }
        b += 1
      }
      bw.flush()
    }
    // scans 3..: per-component AC bands at Al=0 (pure spectral
    // selection; EOB emitted per block — an EOB run of exactly 1)
    for (band <- Seq((1, 5), (6, 63)); c <- 0 until nf) {
      sos(Seq(c), band._1, band._2, 0, 0)
      val bw = new BitWriter(out)
      var b = 0
      while (b < mcusX * mcusY) {
        val zz = coefs(c)(b)
        var k = band._1
        var run = 0
        while (k <= band._2) {
          if (zz(k) == 0) run += 1
          else {
            while (run > 15) { val (zc, zl) = acCodes(0xf0); bw.put(zc, zl); run -= 16 }
            val sz = category(zz(k))
            val (cc, cl) = acCodes((run << 4) | sz)
            bw.put(cc, cl)
            bw.put(if (zz(k) < 0) zz(k) + (1 << sz) - 1 else zz(k), sz)
            run = 0
          }
          k += 1
        }
        if (run > 0) { val (ec, el) = acCodes(0x00); bw.put(ec, el) } // EOB
        b += 1
      }
      bw.flush() // byte-align only at scan end, never mid-scan
    }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Encode an RGB raster (w*h*3 bytes) as a baseline 4:4:4 YCbCr JPEG. */
  def encode(width: Int, height: Int, rgb: Array[Byte],
      quantLuma: Array[Int] = AnnexKLuma, quantChroma: Array[Int] = AnnexKChroma,
      restartInterval: Int = 0): Array[Byte] = {
    require(rgb.length == width * height * 3, "raster size mismatch")
    val n = width * height
    val yP = new Array[Double](n); val cbP = new Array[Double](n); val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbP(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crP(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    encodePlanes(width, height, Array(yP, cbP, crP),
      Array(quantLuma, quantChroma), restartInterval)
  }

  /** Encode a grayscale raster (w*h bytes) as a single-component JPEG. */
  def encodeGray(width: Int, height: Int, gray: Array[Byte],
      quant: Array[Int] = AnnexKLuma, restartInterval: Int = 0): Array[Byte] = {
    require(gray.length == width * height, "raster size mismatch")
    encodePlanes(width, height,
      Array(gray.map(b => (b & 0xff).toDouble)), Array(quant), restartInterval)
  }

  /** Encode an RGB raster as a PROGRESSIVE (SOF2) 4:4:4 YCbCr JPEG —
    * same coefficients as [[encode]], delivered across a DC-first +
    * DC-refinement + spectral-selection scan script. */
  def encodeProgressive(width: Int, height: Int, rgb: Array[Byte],
      quantLuma: Array[Int] = AnnexKLuma,
      quantChroma: Array[Int] = AnnexKChroma): Array[Byte] = {
    require(rgb.length == width * height * 3, "raster size mismatch")
    val n = width * height
    val yP = new Array[Double](n); val cbP = new Array[Double](n); val crP = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      yP(i) = 0.299 * r + 0.587 * g + 0.114 * b
      cbP(i) = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
      crP(i) = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
      i += 1
    }
    encodePlanesProgressive(width, height, Array(yP, cbP, crP),
      Array(quantLuma, quantChroma))
  }

  /** Encode a grayscale raster as a progressive single-component JPEG. */
  def encodeGrayProgressive(width: Int, height: Int, gray: Array[Byte],
      quant: Array[Int] = AnnexKLuma): Array[Byte] = {
    require(gray.length == width * height, "raster size mismatch")
    encodePlanesProgressive(width, height,
      Array(gray.map(b => (b & 0xff).toDouble)), Array(quant))
  }
}
