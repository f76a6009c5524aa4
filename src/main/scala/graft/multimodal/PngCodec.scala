package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** Real pure-JVM PNG codec — no external libraries: DEFLATE and CRC32
  * come from `java.util.zip`, everything else (chunk framing, scanline
  * filtering) is implemented here.
  *
  * Encode writes the minimal well-formed shape: 8-bit RGB (color type 2),
  * non-interlaced, filter 0 scanlines, one IDAT. Decode accepts any
  * non-interlaced 8-bit RGB or RGBA PNG: multiple IDAT chunks, ancillary
  * chunks skipped, all five scanline filter types (None/Sub/Up/Average/
  * Paeth) reversed, alpha dropped on RGBA so callers always get packed
  * RGB. Anything outside that shape (palette, 16-bit, interlace) returns
  * None rather than wrong pixels.
  */
object PngCodec {

  private val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(bytes: Array[Byte]): Boolean =
    bytes.length > Signature.length &&
      Signature.indices.forall(i => bytes(i) == Signature(i))

  /** Encode packed RGB as an 8-bit color-type-2 non-interlaced PNG. */
  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    writeIntBE(ihdr, 0, w)
    writeIntBE(ihdr, 4, h)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // bytes 10..12: compression/filter/interlace method 0
    writeChunk(out, "IHDR", ihdr)

    val stride = w * 3
    val raw = new Array[Byte](h * (1 + stride)) // filter byte 0 + row
    var y = 0
    while (y < h) {
      System.arraycopy(rgb, y * stride, raw, y * (1 + stride) + 1, stride)
      y += 1
    }
    val defl = new Deflater()
    defl.setInput(raw)
    defl.finish()
    val z = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    writeChunk(out, "IDAT", z.toByteArray)
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode → (width, height, packed RGB). None for non-PNG bytes or
    * shapes outside 8-bit RGB/RGBA non-interlaced. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isPng(bytes)) return None
    var p = Signature.length
    var w = 0; var h = 0; var colorType = -1
    val idat = new ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && p + 8 <= bytes.length) {
      val len = readIntBE(bytes, p)
      val dataOff = p + 8
      // Long arithmetic: a crafted len near Int.MaxValue would overflow an
      // Int sum to negative and slip past the bounds check.
      if (len < 0 || dataOff.toLong + len + 4 > bytes.length) return None
      val typ = new String(bytes, p + 4, 4, "US-ASCII")
      typ match {
        case "IHDR" =>
          if (len < 13) return None
          w = readIntBE(bytes, dataOff)
          h = readIntBE(bytes, dataOff + 4)
          val bitDepth = bytes(dataOff + 8) & 0xff
          colorType = bytes(dataOff + 9) & 0xff
          val interlace = bytes(dataOff + 12) & 0xff
          if (bitDepth != 8 || (colorType != 2 && colorType != 6) || interlace != 0)
            return None
        case "IDAT" => idat.write(bytes, dataOff, len)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk — skip
      }
      p = dataOff + len + 4 // past data + CRC
    }
    if (w <= 0 || h <= 0 || colorType < 0 || !sawEnd) return None
    val bpp = if (colorType == 6) 4 else 3
    // Unvalidated IHDR dimensions would otherwise reach the raw-buffer
    // allocation as an overflowed/huge size; cap total pixels (64M ≈ any
    // sane frame) so w*h*bpp stays far inside Int range.
    if (w.toLong * h > (1L << 26)) return None
    val stride = w * bpp

    val raw = new Array[Byte](h * (1 + stride))
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var off = 0
    try {
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
        off += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    if (off != raw.length) return None

    // reverse per-scanline filtering in place into the image plane
    val img = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      val ro = y * (1 + stride) + 1
      val io = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(ro + x) & 0xff
        val a = if (x >= bpp) img(io + x - bpp) & 0xff else 0
        val b = if (y > 0) img(io - stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) img(io - stride + x - bpp) & 0xff else 0
        val v = f match {
          case 0 => cur
          case 1 => cur + a
          case 2 => cur + b
          case 3 => cur + ((a + b) >> 1)
          case 4 => cur + paeth(a, b, c)
          case _ => return None
        }
        img(io + x) = v.toByte
        x += 1
      }
      y += 1
    }

    if (bpp == 3) Some((w, h, img))
    else { // RGBA → RGB
      val rgb = new Array[Byte](w * h * 3)
      var i = 0
      while (i < w * h) {
        rgb(i * 3) = img(i * 4)
        rgb(i * 3 + 1) = img(i * 4 + 1)
        rgb(i * 3 + 2) = img(i * 4 + 2)
        i += 1
      }
      Some((w, h, rgb))
    }
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def writeIntBE(dst: Array[Byte], off: Int, v: Int): Unit = {
    dst(off) = (v >>> 24).toByte
    dst(off + 1) = (v >>> 16).toByte
    dst(off + 2) = (v >>> 8).toByte
    dst(off + 3) = v.toByte
  }

  private def readIntBE(src: Array[Byte], off: Int): Int =
    ((src(off) & 0xff) << 24) | ((src(off + 1) & 0xff) << 16) |
      ((src(off + 2) & 0xff) << 8) | (src(off + 3) & 0xff)

  /** Chunk = len(4 BE) + type(4 ASCII) + data + CRC32(type+data). Public
    * so tests can author PNGs with filter/color shapes the encoder itself
    * never emits. */
  def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    val lenBuf = new Array[Byte](4)
    writeIntBE(lenBuf, 0, data.length)
    out.write(lenBuf, 0, 4)
    val typBytes = typ.getBytes("US-ASCII")
    out.write(typBytes, 0, 4)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(typBytes)
    crc.update(data)
    writeIntBE(lenBuf, 0, crc.getValue.toInt)
    out.write(lenBuf, 0, 4)
  }
}
