package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.Deflater
import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    while (i < w * h) {
      rgb(i * 3) = (i * 7 % 256).toByte
      rgb(i * 3 + 1) = (255 - i % 256).toByte
      rgb(i * 3 + 2) = (i * 31 % 256).toByte
      i += 1
    }
    rgb
  }

  test("encode → decode round-trips pixels exactly") {
    for ((w, h) <- Seq((1, 1), (8, 6), (17, 5), (64, 64))) {
      val rgb = gradient(w, h)
      val png = PngCodec.encode(w, h, rgb)
      assert(PngCodec.isPng(png))
      val Some((dw, dh, back)) = PngCodec.decode(png)
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(back, rgb), s"pixel mismatch at ${w}x$h")
    }
  }

  /** Forward-filter a raw image with a chosen filter per row and wrap it
    * in chunks — produces shapes our encoder never emits, so the decoder's
    * Sub/Up/Average/Paeth reversal is tested against an independent
    * forward implementation. */
  private def buildPng(w: Int, h: Int, bpp: Int, img: Array[Byte],
                       filterOfRow: Int => Int): Array[Byte] = {
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    for (y <- 0 until h) {
      val f = filterOfRow(y)
      raw(y * (1 + stride)) = f.toByte
      for (x <- 0 until stride) {
        val cur = img(y * stride + x) & 0xff
        val a = if (x >= bpp) img(y * stride + x - bpp) & 0xff else 0
        val b = if (y > 0) img((y - 1) * stride + x) & 0xff else 0
        val c = if (x >= bpp && y > 0) img((y - 1) * stride + x - bpp) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - a
          case 2 => cur - b
          case 3 => cur - ((a + b) >> 1)
          case 4 => cur - paeth(a, b, c)
        }
        raw(y * (1 + stride) + 1 + x) = enc.toByte
      }
    }
    val defl = new Deflater()
    defl.setInput(raw); defl.finish()
    val z = new ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8
    ihdr(9) = (if (bpp == 4) 6 else 2).toByte
    PngCodec.writeChunk(out, "IHDR", ihdr)
    // split IDAT in two: decoders must concatenate
    val zb = z.toByteArray
    val cut = zb.length / 2
    PngCodec.writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(zb, 0, cut))
    PngCodec.writeChunk(out, "IDAT", java.util.Arrays.copyOfRange(zb, cut, zb.length))
    PngCodec.writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("decoder reverses all five scanline filters (multi-IDAT)") {
    val (w, h) = (9, 10) // 10 rows cycle through filters 0..4 twice
    val rgb = gradient(w, h)
    val png = buildPng(w, h, 3, rgb, y => y % 5)
    val Some((dw, dh, back)) = PngCodec.decode(png)
    assert(dw == w && dh == h)
    assert(java.util.Arrays.equals(back, rgb), "filter reversal mismatch")
  }

  test("RGBA input decodes with alpha dropped") {
    val (w, h) = (5, 4)
    val rgba = new Array[Byte](w * h * 4)
    val rgb = new Array[Byte](w * h * 3)
    for (i <- 0 until w * h) {
      rgba(i * 4) = (i * 11).toByte; rgba(i * 4 + 1) = (i * 3).toByte
      rgba(i * 4 + 2) = (200 - i).toByte; rgba(i * 4 + 3) = 0x80.toByte
      rgb(i * 3) = rgba(i * 4); rgb(i * 3 + 1) = rgba(i * 4 + 1)
      rgb(i * 3 + 2) = rgba(i * 4 + 2)
    }
    val png = buildPng(w, h, 4, rgba, y => (y + 1) % 5)
    val Some((dw, dh, back)) = PngCodec.decode(png)
    assert(dw == w && dh == h)
    assert(java.util.Arrays.equals(back, rgb))
  }

  test("malformed inputs return None, never garbage") {
    assert(PngCodec.decode("not a png at all".getBytes).isEmpty)
    val good = PngCodec.encode(4, 4, gradient(4, 4))
    assert(PngCodec.decode(java.util.Arrays.copyOf(good, good.length - 9)).isEmpty,
      "truncated file (no IEND / short IDAT) must be rejected")
    val corrupt = good.clone()
    corrupt(40) = (corrupt(40) ^ 0x55).toByte // inside the deflate stream
    // either a DataFormatException path (None) or inflate completes with
    // different bytes — must not throw
    PngCodec.decode(corrupt)
    // PPM magic is not PNG
    assert(!PngCodec.isPng("P6\n2 2\n255\n".getBytes))
  }

  test("crafted chunk lengths and dimensions return None, never throw") {
    // chunk len near Int.MaxValue: Int arithmetic would overflow the
    // bounds check to negative and read past the array
    val bomb = new java.io.ByteArrayOutputStream()
    bomb.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    bomb.write(Array(0x7f, 0xff, 0xff, 0xf0).map(_.toByte)) // len = 2^31-16
    bomb.write("IHDR".getBytes("US-ASCII"))
    bomb.write(new Array[Byte](16))
    assert(PngCodec.decode(bomb.toByteArray).isEmpty)
    // undersized IHDR (len < 13) must not read into the next chunk
    val shortIhdr = new java.io.ByteArrayOutputStream()
    shortIhdr.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    PngCodec.writeChunk(shortIhdr, "IHDR", new Array[Byte](4))
    assert(PngCodec.decode(shortIhdr.toByteArray).isEmpty)
    // absurd IHDR dimensions are rejected before the raw-buffer allocation
    val huge = new java.io.ByteArrayOutputStream()
    huge.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new Array[Byte](13)
    ihdr(0) = 0x7f; ihdr(1) = -1; ihdr(2) = -1; ihdr(3) = -1 // w = 2^31-1
    ihdr(4) = 0x7f; ihdr(5) = -1; ihdr(6) = -1; ihdr(7) = -1 // h = 2^31-1
    ihdr(8) = 8; ihdr(9) = 2
    PngCodec.writeChunk(huge, "IHDR", ihdr)
    PngCodec.writeChunk(huge, "IDAT", Array[Byte](0x78, 0x01))
    PngCodec.writeChunk(huge, "IEND", Array.emptyByteArray)
    assert(PngCodec.decode(huge.toByteArray).isEmpty)
  }
}
