package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Y4mCodecSpec extends AnyFunSuite {

  private def frame(w: Int, h: Int, seed: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => ((i * 7 + seed * 13) % 256).toByte)

  test("encode → decode round-trips planes bit-exactly") {
    val v = Y4mCodec.Video(8, 6, 25, 1, Array(frame(8, 6, 0), frame(8, 6, 1), frame(8, 6, 2)))
    val bytes = Y4mCodec.encode(v)
    assert(Y4mCodec.isY4m(bytes))
    // header is the standard ASCII form any video tool accepts
    assert(new String(bytes.take(40), "US-ASCII").startsWith("YUV4MPEG2 W8 H6 F25:1 "))
    val Some(back) = Y4mCodec.decode(bytes)
    assert(back.width == 8 && back.height == 6)
    assert(back.fpsNum == 25 && back.fpsDen == 1)
    assert(back.frames.length == 3)
    back.frames.zip(v.frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(back.durationMs == 120)
  }

  test("rgb ↔ yuv color conversion is stable and near-inverse") {
    val w = 8; val h = 6
    val rgb = Array.tabulate(3 * w * h)(i => ((i * 11) % 256).toByte)
    val f = Y4mCodec.rgbToFrame(w, h, rgb)
    assert(f.length == 3 * w * h)
    // determinism: integer math, identical on every JVM
    assert(java.util.Arrays.equals(f, Y4mCodec.rgbToFrame(w, h, rgb)))
    val back = Y4mCodec.frameToRgb(w, h, f)
    rgb.zip(back).foreach { case (a, b) =>
      assert(math.abs((a & 0xff) - (b & 0xff)) <= 4,
        s"channel drift ${a & 0xff} -> ${b & 0xff}")
    }
  }

  test("malformed inputs return None") {
    assert(Y4mCodec.decode("not a video".getBytes).isEmpty)
    val good = Y4mCodec.encode(Y4mCodec.Video(4, 4, 25, 1, Array(frame(4, 4, 0))))
    assert(Y4mCodec.decode(java.util.Arrays.copyOf(good, good.length - 5)).isEmpty,
      "truncated frame must be rejected")
    // C420 (subsampled) streams are out of scope and must be refused
    val c420 = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\nFRAME\n".getBytes ++
      new Array[Byte](4 * 4 * 3 / 2)
    assert(Y4mCodec.decode(c420).isEmpty)
  }

  test("malformed headers return None instead of throwing") {
    def hdr(s: String): Array[Byte] =
      s.getBytes("US-ASCII") ++ "FRAME\n".getBytes ++ new Array[Byte](4 * 4 * 3)
    // non-numeric tails must not escape as NumberFormatException
    assert(Y4mCodec.decode(hdr("YUV4MPEG2 W4x H4 F25:1 C444\n")).isEmpty)
    assert(Y4mCodec.decode(hdr("YUV4MPEG2 W4 Hx F25:1 C444\n")).isEmpty)
    // F without ':' must not escape as ArrayIndexOutOfBoundsException
    assert(Y4mCodec.decode(hdr("YUV4MPEG2 W4 H4 F25 C444\n")).isEmpty)
    // no C parameter = spec default 4:2:0 — unsupported, must be refused
    assert(Y4mCodec.decode(hdr("YUV4MPEG2 W4 H4 F25:1\n")).isEmpty)
    // absurd dimensions are rejected before any allocation
    assert(Y4mCodec.decode(hdr("YUV4MPEG2 W100000 H100000 F25:1 C444\n")).isEmpty)
  }
}
