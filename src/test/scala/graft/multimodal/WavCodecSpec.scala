package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class WavCodecSpec extends AnyFunSuite {

  private def tone(n: Int, freq: Double, rate: Int): Array[Short] =
    Array.tabulate(n)(i =>
      math.round(math.sin(2 * math.Pi * freq * i / rate) * 20000).toShort)

  test("encode → decode round-trips exactly") {
    val s = tone(640, 440.0, 16000)
    val enc = WavCodec.encode(16000, s)
    assert(WavCodec.isWav(enc))
    assert(enc.length == 44 + s.length * 2)
    val Some((rate, back)) = WavCodec.decode(enc)
    assert(rate == 16000)
    assert(back.toSeq == s.toSeq)
  }

  test("decode skips unknown chunks and rejects non-PCM16-mono") {
    val s = tone(64, 1000.0, 8000)
    val enc = WavCodec.encode(8000, s)
    // splice a LIST chunk between fmt and data
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = enc.slice(0, 36) ++ list ++ enc.slice(36, enc.length)
    // patch RIFF size (+12 for the spliced chunk)
    spliced(4) = ((enc.length - 8 + 12) & 0xff).toByte
    val Some((rate, back)) = WavCodec.decode(spliced)
    assert(rate == 8000 && back.toSeq == s.toSeq)
    assert(WavCodec.decode("RIFFxxxxWAVEjunk".getBytes).isEmpty)
    assert(WavCodec.decode("not audio".getBytes).isEmpty)
  }

  test("adversarial chunk sizes never throw: truncation + size bombs (fuzz)") {
    val tone = Array.tabulate(4000)(i =>
      (math.sin(i * 0.05) * 12000).toInt.toShort)
    val good = WavCodec.encode(8000, tone)
    for (cut <- 0 until good.length) WavCodec.decode(good.take(cut).toArray)
    val rng = new scala.util.Random(17)
    val evil = Seq(0L, 1L, 3L, 0x7fffffffL, 0xffffffffL, good.length.toLong * 2)
    for (_ <- 1 to 300) {
      val b = good.clone()
      val pos = 4 + rng.nextInt(good.length - 8)
      val v = evil(rng.nextInt(evil.size))
      b(pos) = (v & 0xff).toByte
      b(pos + 1) = ((v >> 8) & 0xff).toByte
      b(pos + 2) = ((v >> 16) & 0xff).toByte
      b(pos + 3) = ((v >> 24) & 0xff).toByte
      WavCodec.decode(b) // Option, never throw
    }
  }

  test("linear resample halves/doubles sample count and keeps the tone") {
    val rate = 16000
    val s = tone(1600, 400.0, rate)
    val down = WavCodec.resampleLinear(s, rate, 8000)
    assert(math.abs(down.length - 800) <= 1)
    val up = WavCodec.resampleLinear(s, rate, 32000)
    assert(math.abs(up.length - 3200) <= 1)
    // zero crossings per second are rate-invariant for a pure tone:
    // 400 Hz → ~800 crossings/s
    def zcPerSec(a: Array[Short], r: Int): Double = {
      var zc = 0
      for (i <- 1 until a.length)
        if ((a(i - 1) < 0 && a(i) >= 0) || (a(i - 1) >= 0 && a(i) < 0)) zc += 1
      zc.toDouble * r / a.length
    }
    assert(math.abs(zcPerSec(down, 8000) - 800.0) < 40.0)
    assert(math.abs(zcPerSec(up, 32000) - 800.0) < 40.0)
  }
}
