package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class PpmCodecSpec extends AnyFunSuite {

  private def gradient(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h * 3)(i => (i % 251).toByte)

  test("encode → decode round-trips exactly") {
    val rgb = gradient(8, 6)
    val enc = PpmCodec.encode(8, 6, rgb)
    assert(PpmCodec.isPpm(enc))
    val Some((w, h, back)) = PpmCodec.decode(enc)
    assert(w == 8 && h == 6)
    assert(back.toSeq == rgb.toSeq)
  }

  test("decode tolerates comment lines and rejects junk") {
    val rgb = gradient(2, 2)
    val withComment = ("P6\n# a comment\n2 2\n255\n").getBytes("US-ASCII") ++ rgb
    val Some((w, h, back)) = PpmCodec.decode(withComment)
    assert(w == 2 && h == 2 && back.toSeq == rgb.toSeq)
    assert(PpmCodec.decode("not an image".getBytes).isEmpty)
    assert(PpmCodec.decode("P6\n2 2\n255\nxx".getBytes).isEmpty, "truncated")
  }

  test("nearest-neighbor resize: exact on integer upscale of a 2x1 image") {
    // left pixel red, right pixel blue
    val rgb = Array[Byte](-1, 0, 0, 0, 0, -1)
    val out = PpmCodec.resizeNearest(2, 1, rgb, 4, 2)
    // columns 0-1 sample the left pixel, 2-3 the right, both rows equal
    for (y <- 0 until 2; x <- 0 until 4) {
      val p = (y * 4 + x) * 3
      if (x < 2) assert((out(p) & 0xff) == 255 && out(p + 2) == 0)
      else assert(out(p) == 0 && (out(p + 2) & 0xff) == 255)
    }
  }
}
