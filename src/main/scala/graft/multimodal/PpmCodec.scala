package graft.multimodal

/** Pure-JVM image codec for binary P6 PPM (the simplest real raster
  * format: `P6\n<w> <h>\n255\n` + raw RGB24). Zero dependencies, fully
  * deterministic — which makes the multimodal decode/resize path REAL
  * for PPM payloads; formats needing external codecs (JPEG, audio)
  * remain behind the documented stub.
  */
object PpmCodec {

  def isPpm(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6'

  def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** Decode P6 → (width, height, rgb). None if not a valid P6 payload.
    * Supports the common header shape with single whitespace separators
    * and an optional comment line after the magic. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isPpm(bytes)) return None
    var p = 2
    def skipWs(): Unit = {
      var done = false
      while (!done && p < bytes.length) {
        val c = bytes(p)
        if (c == '#') { while (p < bytes.length && bytes(p) != '\n') p += 1 }
        else if (c == ' ' || c == '\n' || c == '\r' || c == '\t') p += 1
        else done = true
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (p < bytes.length && bytes(p) >= '0' && bytes(p) <= '9') {
        v = v * 10 + (bytes(p) - '0'); p += 1; any = true
      }
      if (!any) -1 else v
    }
    val w = readInt(); val h = readInt(); val maxV = readInt()
    if (w <= 0 || h <= 0 || maxV != 255 || p >= bytes.length) return None
    p += 1 // the single whitespace after maxval
    val need = w * h * 3
    if (bytes.length - p < need) return None
    val rgb = new Array[Byte](need)
    System.arraycopy(bytes, p, rgb, 0, need)
    Some((w, h, rgb))
  }

  /** Nearest-neighbor resample — the deterministic resize every engine
    * agrees on. */
  def resizeNearest(w: Int, h: Int, rgb: Array[Byte],
                    nw: Int, nh: Int): Array[Byte] = {
    val out = new Array[Byte](nw * nh * 3)
    var y = 0
    while (y < nh) {
      val sy = (y.toLong * h / nh).toInt
      var x = 0
      while (x < nw) {
        val sx = (x.toLong * w / nw).toInt
        val src = (sy * w + sx) * 3
        val dst = (y * nw + x) * 3
        out(dst) = rgb(src); out(dst + 1) = rgb(src + 1); out(dst + 2) = rgb(src + 2)
        x += 1
      }
      y += 1
    }
    out
  }
}
