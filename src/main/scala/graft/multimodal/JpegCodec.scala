package graft.multimodal

import java.io.ByteArrayOutputStream

/** Real pure-JVM baseline JPEG codec — no external libraries, no
  * `javax.imageio` (the JDK decoder is used only in the spec, as an
  * independent reference implementation to validate against).
  *
  * Decode accepts baseline and extended-sequential Huffman JPEG
  * (SOF0/SOF1): 8-bit precision, 1 or 3 components, sampling factors up
  * to 2×2 (4:4:4, 4:2:2, 4:2:0), multi-table DQT/DHT segments, restart
  * markers (DRI/RSTn), ancillary segments skipped. Anything outside
  * that shape (progressive SOF2, arithmetic coding, 12-bit, CMYK)
  * returns None rather than wrong pixels. Output is packed full-range
  * RGB via the JFIF BT.601 matrix.
  *
  * Encode writes the minimal well-formed baseline shape: JFIF APP0,
  * 4:4:4 YCbCr (or single-component grayscale), Annex K quantization
  * tables scaled by the libjpeg quality convention, Annex K Huffman
  * tables, byte-stuffed entropy stream.
  *
  * The reference repo ships no codecs at all (media stays opaque);
  * this closes the builder brief's "decode licensed formats" stub for
  * JPEG — only H.264-class video remains behind `decodeBytesStub`.
  */
object JpegCodec {

  def isJpeg(bytes: Array[Byte]): Boolean =
    bytes.length > 3 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8 &&
      (bytes(2) & 0xff) == 0xff

  // ---------------------------------------------------------------------
  // shared tables

  /** Zig-zag order: ZigZag(i) = raster index of the i-th coefficient. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Inverse permutation: raster index → zig-zag position. */
  private val InvZigZag: Array[Int] = {
    val inv = new Array[Int](64)
    var i = 0
    while (i < 64) { inv(ZigZag(i)) = i; i += 1 }
    inv
  }

  /** Annex K (K.1/K.2) luminance / chrominance quantization bases. */
  private val QLumaBase: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99)
  private val QChromaBase: Array[Int] = Array(
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99)

  /** Annex K Huffman table specs: (bits[1..16], huffval). */
  private val DcLumaBits = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcLumaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val DcChromaBits = Array(0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)
  private val AcLumaBits = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcLumaVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)
  private val AcChromaBits = Array(0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0, 0x15, 0x62, 0x72, 0xd1,
    0x0a, 0x16, 0x24, 0x34, 0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a,
    0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa)

  /** Orthonormal DCT basis A(x)(u) = 0.5·c(u)·cos((2x+1)uπ/16);
    * IDCT is s = A·F·Aᵀ, FDCT is F = Aᵀ·s·A. */
  private val Basis: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ---------------------------------------------------------------------
  // decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // canonical code bounds per length (spec F.2.2.3 DECODE procedure)
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    val huffVal: Array[Int] = vals
    // first-level LUT: an 8-bit peek resolves every code of length ≤ 8
    // (the overwhelming majority in the standard tables) in one step;
    // longer codes fall back to the canonical bit-by-bit walk
    val lutLen = new Array[Byte](256)
    val lutSym = new Array[Int](256)
    locally {
      var code = 0; var k = 0; var l = 1
      while (l <= 16) {
        if (bits(l) > 0) {
          valPtr(l) = k
          minCode(l) = code
          var i = 0
          while (i < bits(l)) {
            if (l <= 8) {
              val base = code << (8 - l)
              val span = 1 << (8 - l)
              var s = 0
              while (s < span) {
                lutLen(base + s) = l.toByte
                lutSym(base + s) = vals(k)
                s += 1
              }
            }
            code += 1; k += 1; i += 1
          }
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
  }

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTable: HuffTable = _
    var acTable: HuffTable = _
    var pred: Int = 0
    var blocksW: Int = 0
    var blocksH: Int = 0
    var plane: Array[Byte] = _ // blocksW*8 × blocksH*8 samples
  }

  /** Entropy-segment bit reader: unstuffs FF00, stops cleanly at any
    * marker (returning 0 bits, which only ever pads the tail byte).
    * Holds up to 56 buffered bits so the Huffman fast path can peek a
    * whole byte and multi-bit magnitudes read without a per-bit loop. */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var buf = 0L
    private var cnt = 0
    var hitMarker = false

    private def fill(): Unit = {
      while (cnt <= 56 && !hitMarker) {
        if (pos >= bytes.length) { hitMarker = true; return }
        val b = bytes(pos) & 0xff
        if (b == 0xff) {
          if (pos + 1 < bytes.length && (bytes(pos + 1) & 0xff) == 0x00) {
            buf = (buf << 8) | 0xffL; cnt += 8; pos += 2
          } else { hitMarker = true } // real marker — leave for the caller
        } else { buf = (buf << 8) | b.toLong; cnt += 8; pos += 1 }
      }
    }

    /** Next 8 bits without consuming; zero-padded at stream end. */
    def peek8(): Int = {
      if (cnt < 8) fill()
      if (cnt >= 8) ((buf >>> (cnt - 8)) & 0xff).toInt
      else ((buf << (8 - cnt)) & 0xff).toInt
    }

    /** Consume bits a successful peek8 match covered. */
    def drop(n: Int): Unit = cnt = math.max(0, cnt - n)

    def nextBit(): Int = {
      if (cnt == 0) fill()
      if (cnt == 0) return 0
      cnt -= 1
      ((buf >>> cnt) & 1L).toInt
    }

    def receive(n: Int): Int = {
      if (n == 0) return 0
      if (cnt < n) fill()
      if (cnt >= n) { cnt -= n; ((buf >>> cnt) & ((1L << n) - 1)).toInt }
      else {
        var v = 0; var i = 0
        while (i < n) { v = (v << 1) | nextBit(); i += 1 }
        v
      }
    }

    /** Byte-align and consume an expected RSTn marker. False if absent. */
    def restart(): Boolean = {
      buf = 0L; cnt = 0; hitMarker = false
      if (pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff) {
        val m = bytes(pos + 1) & 0xff
        if (m >= 0xd0 && m <= 0xd7) { pos += 2; return true }
      }
      false
    }
  }

  private def decodeHuffSlow(br: BitReader, t: HuffTable): Int = {
    var code = br.nextBit()
    var l = 1
    while (l < 16 && (t.maxCode(l) < 0 || code > t.maxCode(l))) {
      code = (code << 1) | br.nextBit()
      l += 1
    }
    if (t.maxCode(l) < 0 || code > t.maxCode(l)) return -1
    val idx = t.valPtr(l) + code - t.minCode(l)
    if (idx >= t.huffVal.length) -1 else t.huffVal(idx)
  }

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    val p = br.peek8()
    val l = t.lutLen(p)
    if (l > 0) { br.drop(l); t.lutSym(p) }
    else decodeHuffSlow(br, t) // code longer than 8 bits (rare)
  }

  /** EXTEND (spec F.2.2.1): map n raw bits to a signed value. */
  private def extend(v: Int, n: Int): Int =
    if (n == 0) 0 else if (v < (1 << (n - 1))) v - (1 << n) + 1 else v

  /** Decode → (width, height, packed RGB). None for anything outside
    * the supported baseline shape or malformed input. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] =
    try decodeUnsafe(bytes) catch { case _: Exception => None }

  private def decodeUnsafe(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isJpeg(bytes)) return None
    val qTables = new Array[Array[Int]](4)
    val dcTables = new Array[HuffTable](4)
    val acTables = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var width = 0; var height = 0
    var restartInterval = 0
    var pos = 2

    def u16(p: Int): Int = ((bytes(p) & 0xff) << 8) | (bytes(p + 1) & 0xff)

    while (pos + 4 <= bytes.length) {
      if ((bytes(pos) & 0xff) != 0xff) return None
      val marker = bytes(pos + 1) & 0xff
      if (marker == 0xd9) return None // EOI before any scan
      if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) { pos += 2 }
      else {
        val len = u16(pos + 2)
        val seg = pos + 4
        val segEnd = pos + 2 + len
        if (len < 2 || segEnd > bytes.length) return None
        marker match {
          case 0xdb => // DQT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val pq = (bytes(p) >> 4) & 0x0f
              val tq = bytes(p) & 0x0f
              if (pq != 0 || tq > 3) return None // 16-bit tables: out of scope
              // kept in zig-zag (stream) order — dequant indexes by k
              val tbl = new Array[Int](64)
              var i = 0
              while (i < 64) { tbl(i) = bytes(p + 1 + i) & 0xff; i += 1 }
              qTables(tq) = tbl
              p += 65
            }
          case 0xc4 => // DHT — possibly several tables
            var p = seg
            while (p < segEnd) {
              val tc = (bytes(p) >> 4) & 0x0f
              val th = bytes(p) & 0x0f
              if (tc > 1 || th > 3) return None
              val bits = new Array[Int](17)
              var total = 0
              var i = 1
              while (i <= 16) { bits(i) = bytes(p + i) & 0xff; total += bits(i); i += 1 }
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = bytes(p + 17 + i) & 0xff; i += 1 }
              val t = new HuffTable(bits, vals)
              if (tc == 0) dcTables(th) = t else acTables(th) = t
              p += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
            if ((bytes(seg) & 0xff) != 8) return None // 8-bit only
            height = u16(seg + 1); width = u16(seg + 3)
            val nf = bytes(seg + 5) & 0xff
            if (width == 0 || height == 0 || (nf != 1 && nf != 3)) return None
            if (width.toLong * height > 64L * 1024 * 1024) return None
            comps = Array.tabulate(nf) { i =>
              val b = seg + 6 + i * 3
              val hv = bytes(b + 1) & 0xff
              val c = new Component(bytes(b) & 0xff, (hv >> 4) & 0x0f, hv & 0x0f,
                bytes(b + 2) & 0x0f)
              if (c.h < 1 || c.h > 2 || c.v < 1 || c.v > 2) return None
              c
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive / lossless / arithmetic: out of scope
          case 0xdd => restartInterval = u16(seg)
          case 0xda => // SOS — decode the scan, then we're done
            if (comps == null) return None
            val ns = bytes(seg) & 0xff
            if (ns != comps.length) return None
            var i = 0
            while (i < ns) {
              val cs = bytes(seg + 1 + i * 2) & 0xff
              val tt = bytes(seg + 2 + i * 2) & 0xff
              val c = comps.find(_.id == cs).getOrElse(return None)
              c.dcTable = dcTables((tt >> 4) & 0x0f)
              c.acTable = acTables(tt & 0x0f)
              if (c.dcTable == null || c.acTable == null) return None
              i += 1
            }
            return decodeScan(bytes, segEnd, comps, width, height,
              qTables, restartInterval)
          case _ => () // APPn / COM / ancillary — skip
        }
        pos = segEnd
      }
    }
    None
  }

  private def decodeScan(bytes: Array[Byte], scanStart: Int,
                         comps: Array[Component], width: Int, height: Int,
                         qTables: Array[Array[Int]],
                         restartInterval: Int): Option[(Int, Int, Array[Byte])] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (width + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (height + 8 * vMax - 1) / (8 * vMax)
    comps.foreach { c =>
      if (qTables(c.tq) == null) return None
      c.blocksW = mcusX * c.h
      c.blocksH = mcusY * c.v
      c.plane = new Array[Byte](c.blocksW * 8 * c.blocksH * 8)
    }

    val br = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val spatial = Array.ofDim[Double](8, 8)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.restart()) return None
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val q = qTables(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            // --- one 8×8 block: Huffman → dequant (un-zigzag) → IDCT
            java.util.Arrays.fill(coef, 0)
            val s = decodeHuff(br, c.dcTable)
            if (s < 0 || s > 15) return None
            c.pred += extend(br.receive(s), s)
            coef(0) = c.pred * q(0)
            var k = 1
            var eob = false
            var nAc = 0
            while (k < 64 && !eob) {
              val rs = decodeHuff(br, c.acTable)
              if (rs < 0) return None
              val r = rs >> 4; val sz = rs & 0x0f
              if (sz == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                if (k > 63) return None
                coef(ZigZag(k)) = extend(br.receive(sz), sz) * q(k)
                nAc += 1
                k += 1
              }
            }
            if (nAc == 0) {
              // DC-only block (very common at normal quality): the IDCT
              // of a constant-frequency block is flat — skip both passes
              val flat = coef(0) / 8.0
              var y = 0
              while (y < 8) {
                var x = 0
                while (x < 8) { spatial(y)(x) = flat; x += 1 }
                y += 1
              }
            } else {
            // separable IDCT with the orthonormal basis
            var v = 0
            while (v < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0; var u = 0
                while (u < 8) { acc += coef(v * 8 + u) * Basis(x)(u); u += 1 }
                tmp(v)(x) = acc
                x += 1
              }
              v += 1
            }
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                var acc = 0.0; var vv = 0
                while (vv < 8) { acc += Basis(y)(vv) * tmp(vv)(x); vv += 1 }
                spatial(y)(x) = acc
                x += 1
              }
              y += 1
            }
            }
            val px0 = (mx * c.h + bx) * 8
            val py0 = (my * c.v + by) * 8
            val stride = c.blocksW * 8
            var py = 0
            while (py < 8) {
              var x = 0
              while (x < 8) {
                val s128 = math.round(spatial(py)(x)).toInt + 128
                c.plane((py0 + py) * stride + px0 + x) =
                  (if (s128 < 0) 0 else if (s128 > 255) 255 else s128).toByte
                x += 1
              }
              py += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // upsample (nearest) + color convert
    val rgb = new Array[Byte](width * height * 3)
    if (comps.length == 1) {
      val c = comps(0)
      val stride = c.blocksW * 8
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          val g = c.plane(y * stride + x)
          val o = (y * width + x) * 3
          rgb(o) = g; rgb(o + 1) = g; rgb(o + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val Array(cy, cb, cr) = comps
      val sy = cy.blocksW * 8; val sb = cb.blocksW * 8; val sr = cr.blocksW * 8
      // sampling factors are 1 or 2 (validated at SOF), so per-pixel
      // nearest upsampling is a SHIFT, not a division
      def sh(sub: Int, max: Int): Int = if (sub == max) 0 else 1
      val shYx = sh(cy.h, hMax); val shYy = sh(cy.v, vMax)
      val shBx = sh(cb.h, hMax); val shBy = sh(cb.v, vMax)
      val shRx = sh(cr.h, hMax); val shRy = sh(cr.v, vMax)
      var y = 0
      while (y < height) {
        // hoist the row bases out of the pixel loop
        val rowY = (y >> shYy) * sy
        val rowB = (y >> shBy) * sb
        val rowR = (y >> shRy) * sr
        var o = y * width * 3
        var x = 0
        while (x < width) {
          val yy = cy.plane(rowY + (x >> shYx)) & 0xff
          val pb = (cb.plane(rowB + (x >> shBx)) & 0xff) - 128
          val pr = (cr.plane(rowR + (x >> shRx)) & 0xff) - 128
          rgb(o) = clamp255(yy + 1.402 * pr)
          rgb(o + 1) = clamp255(yy - 0.344136 * pb - 0.714136 * pr)
          rgb(o + 2) = clamp255(yy + 1.772 * pb)
          o += 3
          x += 1
        }
        y += 1
      }
    }
    Some((width, height, rgb))
  }

  private def clamp255(v: Double): Byte = {
    val i = math.round(v).toInt
    (if (i < 0) 0 else if (i > 255) 255 else i).toByte
  }

  // ---------------------------------------------------------------------
  // encode

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc & 0xff)
          if ((acc & 0xff) == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { put(0x7f, 8 - nBits) } // pad with 1s
  }

  /** (code, length) per symbol from an Annex-K style (bits, vals) spec. */
  private def encodeTable(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val codes = new Array[(Int, Int)](256)
    var code = 0; var k = 0; var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { codes(vals(k)) = (code, l); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    codes
  }

  private def magnitudeCategory(v: Int): Int = {
    var a = math.abs(v); var n = 0
    while (a != 0) { a >>= 1; n += 1 }
    n
  }

  /** libjpeg quality convention: 1..100 → table scale factor. */
  private def scaleQ(base: Array[Int], quality: Int): Array[Int] = {
    val q = math.max(1, math.min(100, quality))
    val scale = if (q < 50) 5000 / q else 200 - 2 * q
    base.map { b =>
      val s = (b * scale + 50) / 100
      math.max(1, math.min(255, s))
    }
  }

  /** Encode packed RGB (or grayscale when `grayscale`) as baseline
    * 4:4:4 JFIF. `rgb` is w*h*3 packed bytes (or w*h for grayscale).
    * `restartInterval` > 0 emits DRI + RSTn every that many MCUs —
    * the stream-resumability feature a chunked 100-TB media scan
    * would rely on. */
  def encode(w: Int, h: Int, rgb: Array[Byte], quality: Int = 85,
             grayscale: Boolean = false, restartInterval: Int = 0): Array[Byte] = {
    val nComp = if (grayscale) 1 else 3
    require(rgb.length == w * h * (if (grayscale) 1 else 3),
      s"payload length ${rgb.length} != ${w * h * (if (grayscale) 1 else 3)}")
    val qLuma = scaleQ(QLumaBase, quality)
    val qChroma = scaleQ(QChromaBase, quality)
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }

    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    Seq('J', 'F', 'I', 'F', 0).foreach(c => u8(c.toInt))
    u16(0x0101); u8(0); u16(1); u16(1); u8(0); u8(0)

    def dqt(id: Int, tbl: Array[Int]): Unit = {
      marker(0xdb); u16(67); u8(id)
      var i = 0
      while (i < 64) { u8(tbl(ZigZag(i))); i += 1 }
    }
    dqt(0, qLuma)
    if (nComp == 3) dqt(1, qChroma)

    marker(0xc0); u16(8 + 3 * nComp); u8(8); u16(h); u16(w); u8(nComp)
    var c = 0
    while (c < nComp) { u8(c + 1); u8(0x11); u8(if (c == 0) 0 else 1); c += 1 }

    def dht(tcTh: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length); u8(tcTh)
      var i = 1
      while (i <= 16) { u8(bits(i)); i += 1 }
      vals.foreach(u8)
    }
    dht(0x00, DcLumaBits, DcLumaVals)
    dht(0x10, AcLumaBits, AcLumaVals)
    if (nComp == 3) {
      dht(0x01, DcChromaBits, DcChromaVals)
      dht(0x11, AcChromaBits, AcChromaVals)
    }

    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }

    marker(0xda); u16(6 + 2 * nComp); u8(nComp)
    c = 0
    while (c < nComp) { u8(c + 1); u8(if (c == 0) 0x00 else 0x11); c += 1 }
    u8(0); u8(63); u8(0)

    val dcLuma = encodeTable(DcLumaBits, DcLumaVals)
    val acLuma = encodeTable(AcLumaBits, AcLumaVals)
    val dcChroma = encodeTable(DcChromaBits, DcChromaVals)
    val acChroma = encodeTable(AcChromaBits, AcChromaVals)
    val bw = new BitWriter(out)
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val tmp = Array.ofDim[Double](8, 8)
    val pred = new Array[Int](3)
    val blocksX = (w + 7) / 8
    val blocksY = (h + 7) / 8

    var mcu = 0
    var by = 0
    while (by < blocksY) {
      var bx = 0
      while (bx < blocksX) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + ((mcu / restartInterval - 1) % 8))
          java.util.Arrays.fill(pred, 0)
        }
        var comp = 0
        while (comp < nComp) {
          // gather the 8×8 block in YCbCr, edge-replicated, level-shifted
          var y = 0
          while (y < 8) {
            val py = math.min(by * 8 + y, h - 1)
            var x = 0
            while (x < 8) {
              val px = math.min(bx * 8 + x, w - 1)
              val s =
                if (grayscale) (rgb(py * w + px) & 0xff).toDouble
                else {
                  val o = (py * w + px) * 3
                  val r = rgb(o) & 0xff; val g = rgb(o + 1) & 0xff
                  val b = rgb(o + 2) & 0xff
                  comp match {
                    case 0 => 0.299 * r + 0.587 * g + 0.114 * b
                    case 1 => -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
                    case _ => 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
                  }
                }
              block(y * 8 + x) = s - 128.0
              x += 1
            }
            y += 1
          }
          // FDCT (F = Aᵀ·s·A) then quantize in zig-zag order
          var u = 0
          while (u < 8) {
            var yy = 0
            while (yy < 8) {
              var acc = 0.0; var x = 0
              while (x < 8) { acc += block(yy * 8 + x) * Basis(x)(u); x += 1 }
              tmp(yy)(u) = acc
              yy += 1
            }
            u += 1
          }
          val q = if (comp == 0) qLuma else qChroma
          var v = 0
          while (v < 8) {
            var uu = 0
            while (uu < 8) {
              var acc = 0.0; var yy = 0
              while (yy < 8) { acc += Basis(yy)(v) * tmp(yy)(uu); yy += 1 }
              coef(InvZigZag(v * 8 + uu)) = math.round(acc / q(v * 8 + uu)).toInt
              uu += 1
            }
            v += 1
          }
          // entropy-code the block
          val (dcT, acT) = if (comp == 0) (dcLuma, acLuma) else (dcChroma, acChroma)
          val diff = coef(0) - pred(comp)
          pred(comp) = coef(0)
          val cat = magnitudeCategory(diff)
          val (dcCode, dcLen) = dcT(cat)
          bw.put(dcCode, dcLen)
          if (cat > 0) bw.put(if (diff < 0) diff + (1 << cat) - 1 else diff, cat)
          var k = 1
          var run = 0
          while (k < 64) {
            if (coef(k) == 0) run += 1
            else {
              while (run > 15) { val (zc, zl) = acT(0xf0); bw.put(zc, zl); run -= 16 }
              val sz = magnitudeCategory(coef(k))
              val (ac, al) = acT((run << 4) | sz)
              bw.put(ac, al)
              bw.put(if (coef(k) < 0) coef(k) + (1 << sz) - 1 else coef(k), sz)
              run = 0
            }
            k += 1
          }
          if (run > 0) { val (ec, el) = acT(0x00); bw.put(ec, el) }
          comp += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }
}
