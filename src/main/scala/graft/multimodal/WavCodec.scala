package graft.multimodal

/** Pure-JVM audio codec for 16-bit PCM mono WAV (RIFF). Zero
  * dependencies, fully deterministic — the audio counterpart of
  * [[PpmCodec]]: with it, the multimodal decode / feature-extract /
  * resample path operates on REAL samples for WAV payloads, leaving only
  * formats that genuinely need external libraries (JPEG, video codecs)
  * behind the documented stub.
  */
object WavCodec {

  def isWav(bytes: Array[Byte]): Boolean =
    bytes.length >= 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E'

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def getLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLE16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Encode mono PCM16 samples as a canonical 44-byte-header WAV. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    putLE32(out, 4, 36 + dataLen)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    putLE32(out, 16, 16) // PCM fmt chunk size
    putLE16(out, 20, 1) // audio format: PCM
    putLE16(out, 22, 1) // channels: mono
    putLE32(out, 24, sampleRate)
    putLE32(out, 28, sampleRate * 2) // byte rate
    putLE16(out, 32, 2) // block align
    putLE16(out, 34, 16) // bits per sample
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    putLE32(out, 40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLE16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode → (sampleRate, samples). None unless RIFF/WAVE + PCM16 mono.
    * Walks the chunk list properly (fmt may be followed by LIST/fact
    * chunks before data in real-world files). */
  def decode(bytes: Array[Byte]): Option[(Int, Array[Short])] = {
    if (!isWav(bytes)) return None
    var p = 12
    var sampleRate = -1
    var ok = false
    var data: Array[Short] = null
    while (p + 8 <= bytes.length && data == null) {
      val id = new String(bytes, p, 4, "US-ASCII")
      val sz = getLE32(bytes, p + 4)
      if (sz < 0 || p + 8 + sz > bytes.length) return None
      id match {
        case "fmt " =>
          if (sz < 16) return None
          val fmt = getLE16(bytes, p + 8)
          val ch = getLE16(bytes, p + 10)
          val bits = getLE16(bytes, p + 22)
          sampleRate = getLE32(bytes, p + 12)
          ok = fmt == 1 && ch == 1 && bits == 16
        case "data" =>
          if (!ok || sampleRate <= 0) return None
          val n = sz / 2
          val s = new Array[Short](n)
          var i = 0
          while (i < n) {
            s(i) = getLE16(bytes, p + 8 + i * 2).toShort
            i += 1
          }
          data = s
        case _ => () // skip LIST/fact/etc.
      }
      p += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    if (data == null) None else Some((sampleRate, data))
  }

  /** Linear-interpolation resample to a new rate (the nearest-neighbor-
    * resize analogue for audio). Deterministic integer-position mapping. */
  def resampleLinear(samples: Array[Short], srcRate: Int, dstRate: Int): Array[Short] = {
    if (srcRate == dstRate || samples.length == 0) return samples.clone()
    val n = math.max(1, (samples.length.toLong * dstRate / srcRate).toInt)
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      val pos = i.toDouble * srcRate / dstRate
      val i0 = math.min(pos.toInt, samples.length - 1)
      val i1 = math.min(i0 + 1, samples.length - 1)
      val frac = pos - i0
      out(i) = math.round(samples(i0) * (1 - frac) + samples(i1) * frac).toShort
      i += 1
    }
    out
  }
}
