package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import org.scalatest.funsuite.AnyFunSuite

/** GIF decoder vs the JDK's independent ImageIO implementation: ImageIO
  * WRITES the GIF (its own palette quantization + LZW encoder), our codec
  * and ImageIO both read it back, and the pixels must agree exactly —
  * byte-for-byte parity against an encoder we did not write. */
class GifCodecSpec extends AnyFunSuite {

  /** A paletted test image: ≤ 256 distinct colors so the GIF writer
    * quantizes losslessly and pixel parity is exact. */
  private def palettedImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (x * 7 + y * 13) % 64
      img.setRGB(x, y, ((k * 4) << 16) | ((255 - k * 3) << 8) | (k * 2))
    }
    img
  }

  private def toGif(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", out), "JDK refused to write GIF")
    out.toByteArray
  }

  test("decodes JDK-encoded GIFs pixel-exactly") {
    for ((w, h) <- Seq((1, 1), (8, 6), (17, 5), (64, 64), (33, 70))) {
      val img = palettedImage(w, h)
      val gif = toGif(img)
      assert(GifCodec.isGif(gif))
      val Some((dw, dh, rgb)) = GifCodec.decode(gif)
      assert(dw == w && dh == h)
      val jdk = ImageIO.read(new ByteArrayInputStream(gif))
      var bad = 0
      for (y <- 0 until h; x <- 0 until w) {
        val expect = jdk.getRGB(x, y)
        val q = (y * w + x) * 3
        val got = ((rgb(q) & 0xff) << 16) | ((rgb(q + 1) & 0xff) << 8) | (rgb(q + 2) & 0xff)
        if (got != (expect & 0xffffff)) bad += 1
      }
      assert(bad == 0, s"$bad mismatched pixels at ${w}x$h")
    }
  }

  test("LZW survives dictionary-stress input (long runs + high diversity)") {
    // long constant runs drive KwKwK codes; a diverse tail grows the
    // dictionary through several code-width bumps
    val w = 128; val h = 64
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = if (y < 32) 0x336699 else ((x * 31 + y * 17) % 256) * 0x010101
      img.setRGB(x, y, v)
    }
    val gif = toGif(img)
    val Some((dw, dh, rgb)) = GifCodec.decode(gif)
    assert(dw == w && dh == h)
    val jdk = ImageIO.read(new ByteArrayInputStream(gif))
    for (y <- 0 until h; x <- 0 until w) {
      val q = (y * w + x) * 3
      val got = ((rgb(q) & 0xff) << 16) | ((rgb(q + 1) & 0xff) << 8) | (rgb(q + 2) & 0xff)
      assert(got == (jdk.getRGB(x, y) & 0xffffff), s"pixel ($x,$y)")
    }
  }

  test("frameCount sees every frame of an animated stream") {
    // ImageIO writes multi-frame GIFs through a sequence writer
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until 3).foreach { i =>
      val img = palettedImage(10 + i, 10)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = out.toByteArray
    assert(GifCodec.frameCount(gif) == 3)
    // first-frame decode still works on the animated container
    val Some((dw, _, _)) = GifCodec.decode(gif)
    assert(dw == 10)
  }

  test("malformed payloads cost None, never a throw") {
    val good = toGif(palettedImage(32, 32))
    assert(GifCodec.decode(Array[Byte]()) == None)
    assert(GifCodec.decode("GIF89a".getBytes) == None)
    // truncations at every length up to the full payload
    (0 until good.length by 7).foreach { n =>
      GifCodec.decode(good.take(n)) // must not throw
    }
    // single-byte corruptions across the stream
    (6 until good.length by 11).foreach { i =>
      val bad = good.clone()
      bad(i) = (bad(i) ^ 0x5a).toByte
      GifCodec.decode(bad) // must not throw; None or a decoded frame both fine
    }
    // absurd dimensions must be rejected (the 64-MP cap)
    val huge = good.clone()
    // logical screen stays; patch the image descriptor's w/h if present
    val idx = huge.indexOf(0x2c.toByte)
    if (idx > 0 && idx + 9 < huge.length) {
      huge(idx + 5) = 0xff.toByte; huge(idx + 6) = 0xff.toByte
      huge(idx + 7) = 0xff.toByte; huge(idx + 8) = 0xff.toByte
      GifCodec.decode(huge) // must not allocate 12 GB or throw
    }
  }
}
