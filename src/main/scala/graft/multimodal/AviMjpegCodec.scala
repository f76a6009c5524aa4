package graft.multimodal

import java.io.ByteArrayOutputStream

/** Real pure-JVM MJPEG-in-AVI video codec — compressed video with no
  * external libraries: the container is RIFF/AVI (little-endian chunk
  * framing, `hdrl` with avih/strh/strf headers, `movi` with one `00dc`
  * chunk per frame) and every frame payload is a baseline JPEG decoded
  * by [[JpegCodec]]. MJPEG is the classic patent-free compressed video
  * format (webcams, capture cards, intermediate pipelines), which makes
  * it the honest coverage point between raw YUV4MPEG2 ([[Y4mCodec]])
  * and the H.264-class formats that genuinely need licensed externals
  * (those remain behind `decodeBytesStub`).
  *
  * Decode accepts any AVI whose video chunks (`##dc`/`##db`) hold
  * baseline JPEGs: chunk walking is bounds-checked, unknown chunks and
  * LISTs are skipped, and anything malformed returns None. Frame
  * dimensions come from the frames themselves and must agree. */
object AviMjpegCodec {

  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                         frames: Seq[Array[Byte]]) { // packed RGB per frame
    def durationMs: Int =
      if (fpsNum == 0) 0 else (frames.size.toLong * 1000 * fpsDen / fpsNum).toInt
  }

  def isAvi(bytes: Array[Byte]): Boolean =
    bytes.length > 12 &&
      bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'A' && bytes(9) == 'V' && bytes(10) == 'I' && bytes(11) == ' '

  // ---------------------------------------------------------------- encode

  private def u32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
  private def u16w(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >> 8) & 0xff)
  }
  private def fourcc(out: ByteArrayOutputStream, s: String): Unit =
    s.foreach(c => out.write(c.toInt))

  /** Encode RGB frames as MJPEG/AVI at `fps` frames per second. */
  def encode(w: Int, h: Int, fps: Int, framesRgb: Seq[Array[Byte]],
             quality: Int = 85): Array[Byte] = {
    require(framesRgb.nonEmpty, "at least one frame")
    val jpegs = framesRgb.map(f => JpegCodec.encode(w, h, f, quality))

    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      fourcc(o, id); u32(o, body.length.toLong)
      o.write(body, 0, body.length)
      if (body.length % 2 == 1) o.write(0) // RIFF chunks are even-aligned
      o.toByteArray
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      fourcc(o, "LIST"); u32(o, (body.length + 4).toLong); fourcc(o, kind)
      o.write(body, 0, body.length)
      o.toByteArray
    }

    val maxFrame = jpegs.map(_.length).max
    val avih = { // main AVI header
      val o = new ByteArrayOutputStream()
      u32(o, if (fps == 0) 0 else 1000000L / fps) // µs per frame
      u32(o, maxFrame.toLong * fps); u32(o, 0); u32(o, 0x10 /* AVIF_HASINDEX: idx1 below */)
      u32(o, jpegs.size.toLong); u32(o, 0); u32(o, 1); u32(o, maxFrame.toLong)
      u32(o, w.toLong); u32(o, h.toLong)
      (1 to 4).foreach(_ => u32(o, 0))
      chunk("avih", o.toByteArray)
    }
    val strh = {
      val o = new ByteArrayOutputStream()
      fourcc(o, "vids"); fourcc(o, "MJPG")
      u32(o, 0); u16w(o, 0); u16w(o, 0); u32(o, 0)
      u32(o, 1); u32(o, fps.toLong) // scale, rate → fps = rate/scale
      u32(o, 0); u32(o, jpegs.size.toLong); u32(o, maxFrame.toLong)
      u32(o, 0xffffffffL); u32(o, 0)
      u16w(o, 0); u16w(o, 0); u16w(o, w); u16w(o, h)
      chunk("strh", o.toByteArray)
    }
    val strf = { // BITMAPINFOHEADER
      val o = new ByteArrayOutputStream()
      u32(o, 40); u32(o, w.toLong); u32(o, h.toLong)
      u16w(o, 1); u16w(o, 24); fourcc(o, "MJPG")
      u32(o, (w * h * 3).toLong); u32(o, 0); u32(o, 0); u32(o, 0); u32(o, 0)
      chunk("strf", o.toByteArray)
    }
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi",
      jpegs.flatMap(j => chunk("00dc", j)).toArray)
    // idx1: one 16-byte entry per frame chunk; offsets are relative to the
    // 'movi' fourcc (the widespread convention), so the first chunk sits at
    // offset 4. Required for the AVIF_HASINDEX flag set in avih to be
    // truthful — strict players use it to seek.
    val idx1 = {
      val o = new ByteArrayOutputStream()
      var off = 4L
      jpegs.foreach { j =>
        fourcc(o, "00dc"); u32(o, 0x10L /* AVIIF_KEYFRAME */)
        u32(o, off); u32(o, j.length.toLong)
        off += 8 + j.length + (j.length % 2)
      }
      chunk("idx1", o.toByteArray)
    }

    val out = new ByteArrayOutputStream()
    fourcc(out, "RIFF")
    u32(out, (4 + hdrl.length + movi.length + idx1.length).toLong)
    fourcc(out, "AVI ")
    out.write(hdrl, 0, hdrl.length)
    out.write(movi, 0, movi.length)
    out.write(idx1, 0, idx1.length)
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  def decode(bytes: Array[Byte]): Option[Video] =
    try decodeUnsafe(bytes) catch { case _: Exception => None }

  private def rdU32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL)) | ((b(p + 1) & 0xffL) << 8) |
      ((b(p + 2) & 0xffL) << 16) | ((b(p + 3) & 0xffL) << 24)

  private def decodeUnsafe(bytes: Array[Byte]): Option[Video] = {
    if (!isAvi(bytes)) return None
    var fpsNum = 0; var fpsDen = 1
    val payloads = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]

    /** Walk chunks in [from, to): collect video payload offsets, recurse
      * into LISTs, read the frame rate from strh. Depth-capped: real AVIs
      * nest hdrl/strl/movi ≤ 3 deep; a crafted byte stream nesting LISTs
      * thousands deep would otherwise overflow the stack, which escapes
      * the Exception guard in decode(). */
    def walk(from: Int, to: Int, depth: Int = 0): Unit = {
      if (depth > 16) return
      var p = from
      while (p + 8 <= to) {
        val id = new String(bytes, p, 4, "US-ASCII")
        val sz = rdU32(bytes, p + 4)
        if (sz < 0 || p + 8 + sz > to) return // truncated: stop cleanly
        val body = p + 8
        if (id == "LIST" && sz >= 4) walk(body + 4, body + sz.toInt, depth + 1)
        else if (id.substring(2) == "dc" || id.substring(2) == "db")
          payloads += ((body, sz.toInt))
        else if (id == "strh" && sz >= 32) {
          val scale = rdU32(bytes, body + 20).toInt
          val rate = rdU32(bytes, body + 24).toInt
          if (scale > 0 && rate > 0) { fpsNum = rate; fpsDen = scale }
        }
        p = body + sz.toInt + (sz.toInt & 1) // even alignment
      }
    }
    walk(12, bytes.length)
    if (payloads.isEmpty) return None

    var w = -1; var h = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    payloads.foreach { case (off, len) =>
      val payload = java.util.Arrays.copyOfRange(bytes, off, off + len)
      JpegCodec.decode(payload) match {
        case Some((fw, fh, rgb)) =>
          if (w < 0) { w = fw; h = fh }
          else if (fw != w || fh != h) return None // inconsistent dims
          frames += rgb
        case None => return None // non-JPEG video chunk: out of scope
      }
    }
    Some(Video(w, h, fpsNum, fpsDen, frames.toSeq))
  }
}
