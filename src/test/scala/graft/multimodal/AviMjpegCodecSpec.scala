package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

class AviMjpegCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, shift: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (128 + 90 * math.sin((x + shift) * 0.1)).toInt.toByte
      rgb(o + 1) = (128 + 80 * math.cos((y + shift) * 0.12)).toInt.toByte
      rgb(o + 2) = ((x + y + shift * 5) % 200 + 20).toByte
    }
    rgb
  }

  private def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    var se = 0.0
    for (i <- a.indices) { val d = (a(i) & 0xff) - (b(i) & 0xff); se += d * d }
    if (se == 0) Double.PositiveInfinity
    else 10 * math.log10(255.0 * 255.0 * a.length / se)
  }

  test("encode → decode round-trips frames, dimensions, and frame rate") {
    val (w, h) = (48, 32)
    val frames = (0 until 6).map(i => frame(w, h, i))
    val avi = AviMjpegCodec.encode(w, h, fps = 25, frames, quality = 90)
    assert(AviMjpegCodec.isAvi(avi))
    val Some(v) = AviMjpegCodec.decode(avi)
    assert(v.width == w && v.height == h)
    assert(v.fpsNum == 25 && v.fpsDen == 1)
    assert(v.frames.size == 6)
    assert(v.durationMs == 240)
    v.frames.zip(frames).zipWithIndex.foreach { case ((got, orig), i) =>
      val p = psnr(orig, got)
      assert(p > 30, s"frame $i PSNR $p")
    }
  }

  test("every embedded frame is a JPEG the JDK decoder accepts") {
    val (w, h) = (32, 24)
    val avi = AviMjpegCodec.encode(w, h, 10, (0 until 3).map(i => frame(w, h, i)))
    // walk the container independently: extract 00dc payloads and hand
    // them to the JDK's own JPEG reader
    var p = 12; var found = 0
    def u32(i: Int): Long = (avi(i) & 0xffL) | ((avi(i + 1) & 0xffL) << 8) |
      ((avi(i + 2) & 0xffL) << 16) | ((avi(i + 3) & 0xffL) << 24)
    def walk(from: Int, to: Int): Unit = {
      var q = from
      while (q + 8 <= to) {
        val id = new String(avi, q, 4, "US-ASCII")
        val sz = u32(q + 4).toInt
        if (id == "LIST") walk(q + 12, q + 8 + sz)
        else if (id == "00dc") {
          val img = ImageIO.read(new ByteArrayInputStream(avi, q + 8, sz))
          assert(img != null && img.getWidth == w && img.getHeight == h)
          found += 1
        }
        q += 8 + sz + (sz & 1)
      }
    }
    walk(p, avi.length)
    assert(found == 3, s"expected 3 JDK-validated frames, found $found")
  }

  test("adversarial chunk sizes never throw: truncation, size bombs, LIST nesting (fuzz)") {
    val frames = Seq(frame(16, 16, 0), frame(16, 16, 1), frame(16, 16, 2))
    val good = AviMjpegCodec.encode(16, 16, 10, frames)
    // truncation at EVERY byte length — the u32-truncation class
    for (cut <- 0 until good.length) AviMjpegCodec.decode(good.take(cut).toArray)
    // size-field mutation: stomp random u32s with adversarial values
    // (0, 1, INT_MAX, 0xffffffff, 2x file size) — the overlapping-LIST
    // and overrun classes; decode must return an Option, never throw
    val rng = new scala.util.Random(41)
    val evil = Seq(0L, 1L, 3L, 0x7fffffffL, 0xffffffffL, good.length.toLong * 2)
    for (_ <- 1 to 400) {
      val b = good.clone()
      val pos = 4 + rng.nextInt(good.length - 8)
      val v = evil(rng.nextInt(evil.size))
      b(pos) = (v & 0xff).toByte
      b(pos + 1) = ((v >> 8) & 0xff).toByte
      b(pos + 2) = ((v >> 16) & 0xff).toByte
      b(pos + 3) = ((v >> 24) & 0xff).toByte
      AviMjpegCodec.decode(b)
    }
    // LIST-nesting bomb: thousands of nested LISTs would stack-overflow
    // an uncapped recursive walker (Error, not Exception — the decode
    // guard would not catch it); the depth cap must absorb it
    val bomb = new java.io.ByteArrayOutputStream()
    def u32le(v: Long): Unit = {
      bomb.write((v & 0xff).toInt); bomb.write(((v >> 8) & 0xff).toInt)
      bomb.write(((v >> 16) & 0xff).toInt); bomb.write(((v >> 24) & 0xff).toInt)
    }
    val depth = 20000
    bomb.write("RIFF".getBytes); u32le(4L + depth * 12); bomb.write("AVI ".getBytes)
    for (d <- depth to 1 by -1) {
      bomb.write("LIST".getBytes); u32le(4L + (d - 1) * 12); bomb.write("hdrl".getBytes)
    }
    assert(AviMjpegCodec.decode(bomb.toByteArray).isEmpty) // and no StackOverflowError
  }

  test("malformed input returns None, never throws") {
    val good = AviMjpegCodec.encode(16, 16, 5, Seq(frame(16, 16, 0)))
    assert(AviMjpegCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    assert(AviMjpegCodec.decode(good.take(40).toArray).isEmpty)
    // a y4m payload is not an AVI
    assert(AviMjpegCodec.decode("YUV4MPEG2 W2 H2 F25:1\n".getBytes).isEmpty)
    // corrupt one frame's JPEG magic: decode must reject, not crash
    val bad = good.clone()
    var i = 12
    var patched = false
    while (!patched && i + 12 < bad.length) {
      if (new String(bad, i, 4, "US-ASCII") == "00dc") {
        bad(i + 8) = 0x00; patched = true
      }
      i += 1
    }
    assert(patched)
    assert(AviMjpegCodec.decode(bad).isEmpty)
    // fuzz: random byte soup with a valid RIFF/AVI prefix
    val rng = new scala.util.Random(3)
    for (_ <- 1 to 200) {
      val junk = "RIFF".getBytes ++ Array.fill(4)(rng.nextInt(256).toByte) ++
        "AVI ".getBytes ++ Array.fill(rng.nextInt(200))(rng.nextInt(256).toByte)
      AviMjpegCodec.decode(junk) // Option, no throw
    }
  }
}
