package graft.multimodal

import java.io.ByteArrayOutputStream

/** Real pure-JVM YUV4MPEG2 (.y4m) video codec — the uncompressed
  * interchange format every video toolchain reads (`ffmpeg`, `mpv`, x264
  * all accept these bytes as-is).
  *
  * Stream = ASCII header `YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 C444`
  * then per frame `FRAME\n` + the three full-resolution planes (C444: no
  * chroma subsampling, so plane sizes are all w·h). Decode tolerates
  * unknown header parameters (skipped, per spec) but only C444 8-bit —
  * anything else returns None rather than wrong pixels.
  *
  * RGB↔YUV uses the BT.601 full-range integer approximation, identical
  * on every JVM (pure integer ops) — lossy by nature (that's color
  * conversion, not a shortcut); the YUV payload itself round-trips
  * bit-exactly.
  */
object Y4mCodec {

  private val Magic = "YUV4MPEG2 ".getBytes("US-ASCII")

  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                         frames: Array[Array[Byte]]) {
    def durationMs: Int =
      if (fpsNum == 0) 0 else (frames.length.toLong * 1000 * fpsDen / fpsNum).toInt
  }

  def isY4m(bytes: Array[Byte]): Boolean =
    bytes.length > Magic.length && Magic.indices.forall(i => bytes(i) == Magic(i))

  /** Encode C444 frames (each = Y ++ U ++ V planes, 3·w·h bytes). */
  def encode(v: Video): Array[Byte] = {
    val planeLen = v.width * v.height
    v.frames.foreach(f => require(f.length == 3 * planeLen,
      s"frame has ${f.length} bytes, want ${3 * planeLen}"))
    val out = new ByteArrayOutputStream()
    val header = s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen} Ip A1:1 C444\n"
    out.write(header.getBytes("US-ASCII"))
    val frameMark = "FRAME\n".getBytes("US-ASCII")
    v.frames.foreach { f =>
      out.write(frameMark)
      out.write(f)
    }
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Option[Video] = {
    if (!isY4m(bytes)) return None
    val nl = bytes.indexOf('\n'.toByte)
    if (nl < 0) return None
    val header = new String(bytes, 0, nl, "US-ASCII")
    // No C parameter means 4:2:0 per the YUV4MPEG2 spec default — an
    // unsupported layout here, so it must be rejected, not read as C444.
    var w = 0; var h = 0; var fn = 25; var fd = 1; var c444 = false
    val parsed = scala.util.Try {
      header.split(' ').drop(1).foreach { p =>
        if (p.nonEmpty) p.head match {
          case 'W' => w = p.tail.toInt
          case 'H' => h = p.tail.toInt
          case 'F' => val xs = p.tail.split(':'); fn = xs(0).toInt; fd = xs(1).toInt
          case 'C' => c444 = p.tail == "444"
          case _ => () // interlace/aspect/extension params — skipped
        }
      }
    }
    // Malformed numeric tails or an F without ':' return None, as
    // documented, instead of escaping as NumberFormat/ArrayIndex errors.
    if (parsed.isFailure) return None
    if (w <= 0 || h <= 0 || !c444 || fn <= 0 || fd <= 0 ||
        w.toLong * h > (1L << 26)) return None
    val planeLen = w * h
    val frameMark = "FRAME".getBytes("US-ASCII")
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var p = nl + 1
    while (p < bytes.length) {
      if (p + frameMark.length > bytes.length ||
          !frameMark.indices.forall(i => bytes(p + i) == frameMark(i)))
        return None
      // frame header may carry parameters up to its newline
      val fnl = bytes.indexOf('\n'.toByte, p)
      if (fnl < 0 || fnl + 1 + 3 * planeLen > bytes.length) return None
      frames += java.util.Arrays.copyOfRange(bytes, fnl + 1, fnl + 1 + 3 * planeLen)
      p = fnl + 1 + 3 * planeLen
    }
    Some(Video(w, h, fn, fd, frames.toArray))
  }

  /** BT.601 full-range RGB → one C444 frame (integer-exact on any JVM). */
  def rgbToFrame(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == 3 * w * h)
    val n = w * h
    val out = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      val r = rgb(3 * i) & 0xff
      val g = rgb(3 * i + 1) & 0xff
      val b = rgb(3 * i + 2) & 0xff
      val y = (77 * r + 150 * g + 29 * b) >> 8
      val u = ((-43 * r - 85 * g + 128 * b) >> 8) + 128
      val v = ((128 * r - 107 * g - 21 * b) >> 8) + 128
      out(i) = clamp(y); out(n + i) = clamp(u); out(2 * n + i) = clamp(v)
      i += 1
    }
    out
  }

  /** Inverse BT.601 full-range: one C444 frame → packed RGB. */
  def frameToRgb(w: Int, h: Int, frame: Array[Byte]): Array[Byte] = {
    val n = w * h
    require(frame.length == 3 * n)
    val rgb = new Array[Byte](3 * n)
    var i = 0
    while (i < n) {
      val y = frame(i) & 0xff
      val u = (frame(n + i) & 0xff) - 128
      val v = (frame(2 * n + i) & 0xff) - 128
      rgb(3 * i) = clamp(y + ((359 * v) >> 8))
      rgb(3 * i + 1) = clamp(y - ((88 * u + 183 * v) >> 8))
      rgb(3 * i + 2) = clamp(y + ((454 * u) >> 8))
      i += 1
    }
    rgb
  }

  private def clamp(v: Int): Byte =
    (if (v < 0) 0 else if (v > 255) 255 else v).toByte
}
