package graft.multimodal

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** JpegCodec validated two ways: our encode ↔ our decode (lossy
  * round-trip fidelity), and BOTH directions against the JDK's own
  * `javax.imageio` JPEG implementation as an independent reference —
  * the JDK decodes our streams, we decode the JDK's (which exercises
  * 4:2:0 subsampling, since the JDK writer subsamples by default). */
class JpegCodecSpec extends AnyFunSuite {

  /** Smooth synthetic image — JPEG is built for this shape, so fidelity
    * gates can be tight. */
  private def smooth(w: Int, h: Int): Array[Byte] = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      rgb(o) = (128 + 100 * math.sin(x * 0.08) * math.cos(y * 0.11)).toInt.toByte
      rgb(o + 1) = (128 + 90 * math.sin((x + y) * 0.05)).toInt.toByte
      rgb(o + 2) = (40 + (x * 2 + y) % 160).toByte
    }
    rgb
  }

  private def psnr(a: Array[Byte], b: Array[Byte]): Double = {
    require(a.length == b.length)
    var se = 0.0
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      se += d.toDouble * d
      i += 1
    }
    if (se == 0) Double.PositiveInfinity
    else 10 * math.log10(255.0 * 255.0 * a.length / se)
  }

  private def jdkDecode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "JDK failed to decode the stream")
    val w = img.getWidth; val h = img.getHeight
    val rgb = new Array[Byte](w * h * 3)
    val gray = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      if (gray) {
        // raw raster sample — getRGB would apply a gray→sRGB gamma ramp
        val g = img.getRaster.getSample(x, y, 0)
        rgb(o) = g.toByte; rgb(o + 1) = g.toByte; rgb(o + 2) = g.toByte
      } else {
        val p = img.getRGB(x, y)
        rgb(o) = ((p >> 16) & 0xff).toByte
        rgb(o + 1) = ((p >> 8) & 0xff).toByte
        rgb(o + 2) = (p & 0xff).toByte
      }
    }
    (w, h, rgb)
  }

  private def jdkEncode(w: Int, h: Int, rgb: Array[Byte], q: Float): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val o = (y * w + x) * 3
      img.setRGB(x, y, ((rgb(o) & 0xff) << 16) | ((rgb(o + 1) & 0xff) << 8) |
        (rgb(o + 2) & 0xff))
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(q)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  test("encode → decode round-trips with high fidelity") {
    for ((w, h) <- Seq((8, 8), (16, 16), (40, 24), (33, 17), (1, 1))) {
      val rgb = smooth(w, h)
      val jpg = JpegCodec.encode(w, h, rgb, quality = 90)
      assert(JpegCodec.isJpeg(jpg))
      val Some((dw, dh, back)) = JpegCodec.decode(jpg)
      assert(dw == w && dh == h)
      val p = psnr(rgb, back)
      assert(p > 30, s"round-trip PSNR $p at ${w}x$h")
    }
  }

  test("the JDK decoder agrees with ours on our own streams") {
    val (w, h) = (48, 32)
    val rgb = smooth(w, h)
    val jpg = JpegCodec.encode(w, h, rgb, quality = 90)
    val Some((_, _, ours)) = JpegCodec.decode(jpg)
    val (jw, jh, jdk) = jdkDecode(jpg)
    assert(jw == w && jh == h)
    // same stream, two decoders: differences are IDCT/rounding only
    var sumAbs = 0L; var maxAbs = 0
    for (i <- ours.indices) {
      val d = math.abs((ours(i) & 0xff) - (jdk(i) & 0xff))
      sumAbs += d; if (d > maxAbs) maxAbs = d
    }
    val mean = sumAbs.toDouble / ours.length
    assert(mean < 1.5, s"mean abs diff vs JDK $mean")
    assert(maxAbs <= 16, s"max abs diff vs JDK $maxAbs")
  }

  test("we decode the JDK's streams (4:2:0 subsampled) faithfully") {
    val (w, h) = (64, 48)
    val rgb = smooth(w, h)
    val jpg = jdkEncode(w, h, rgb, 0.9f)
    val Some((dw, dh, ours)) = JpegCodec.decode(jpg)
    assert(dw == w && dh == h)
    // against the original: both decoders should land near it
    val pOurs = psnr(rgb, ours)
    assert(pOurs > 26, s"PSNR vs original $pOurs")
    // against the JDK's own decode of the same stream (upsampling differs)
    val (_, _, jdk) = jdkDecode(jpg)
    val pCross = psnr(jdk, ours)
    assert(pCross > 30, s"PSNR vs JDK decode $pCross")
  }

  test("grayscale single-component streams round-trip") {
    val (w, h) = (24, 24)
    val gray = Array.tabulate(w * h)(i => (40 + (i * 5) % 180).toByte)
    val jpg = JpegCodec.encode(w, h, gray, quality = 92, grayscale = true)
    val Some((dw, dh, back)) = JpegCodec.decode(jpg)
    assert(dw == w && dh == h && back.length == w * h * 3)
    // expand to RGB for comparison
    val rgbOrig = gray.flatMap(g => Array(g, g, g))
    assert(psnr(rgbOrig, back) > 32)
    // JDK agrees it is a valid grayscale JPEG of the same content
    val (_, _, jdk) = jdkDecode(jpg)
    assert(psnr(jdk, back) > 35)
  }

  test("restart markers (DRI/RSTn) decode to the same pixels") {
    val (w, h) = (40, 24) // 15 MCUs at 4:4:4
    val rgb = smooth(w, h)
    val plain = JpegCodec.encode(w, h, rgb, quality = 88)
    val withRst = JpegCodec.encode(w, h, rgb, quality = 88, restartInterval = 2)
    assert(withRst.length > plain.length) // RST markers really in the stream
    val Some((_, _, a)) = JpegCodec.decode(plain)
    val Some((_, _, b)) = JpegCodec.decode(withRst)
    assert(java.util.Arrays.equals(a, b), "restart stream decoded differently")
    // and the JDK accepts the restart stream too
    val (_, _, jdk) = jdkDecode(withRst)
    assert(psnr(jdk, b) > 40)
  }

  test("decoder never throws on arbitrary byte soup (fuzz)") {
    val rng = new scala.util.Random(99)
    for (_ <- 1 to 500) {
      val bytes = Array.fill(rng.nextInt(400))(rng.nextInt(256).toByte)
      JpegCodec.decode(bytes) // must return None or Some, never throw
      JpegCodec.decode(Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ bytes)
    }
    // and on truncations of a VALID stream at every length
    val good = JpegCodec.encode(16, 12, smooth(16, 12))
    for (cut <- 0 until good.length) JpegCodec.decode(good.take(cut).toArray)
  }

  test("random noise images round-trip at random sizes and qualities (fuzz)") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 12) {
      val w = 1 + rng.nextInt(40); val h = 1 + rng.nextInt(40)
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte) // JPEG's worst case
      val q = 50 + rng.nextInt(51)
      val jpg = JpegCodec.encode(w, h, rgb, q)
      val Some((dw, dh, back)) = JpegCodec.decode(jpg)
      assert(dw == w && dh == h && back.length == w * h * 3, s"${w}x$h q$q")
      // the JDK accepts every stream we emit
      val img = ImageIO.read(new ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == w && img.getHeight == h, s"${w}x$h q$q")
    }
  }

  test("malformed and out-of-scope inputs return None, never throw") {
    val good = JpegCodec.encode(16, 16, smooth(16, 16))
    assert(JpegCodec.decode(Array[Byte](0x12, 0x34)).isEmpty)
    assert(JpegCodec.decode(good.take(20).toArray).isEmpty) // truncated header
    assert(JpegCodec.decode(good.dropRight(40).toArray).isEmpty ||
      JpegCodec.decode(good.dropRight(40).toArray).nonEmpty) // truncated scan: no throw
    // progressive (SOF2) is declared out of scope
    val prog = good.clone()
    val sofAt = {
      var i = 2; var at = -1
      while (at < 0 && i + 1 < prog.length) {
        if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) at = i
        i += 1
      }
      at
    }
    assert(sofAt > 0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // garbage past a valid SOI is rejected
    val junk = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0x7f, 0x00)
    assert(JpegCodec.decode(junk).isEmpty)
  }
}
