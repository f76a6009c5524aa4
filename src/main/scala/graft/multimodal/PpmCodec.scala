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

  /** Bilinear resample in 16.16 fixed-point integer arithmetic — fully
    * deterministic across JVMs/platforms (no float rounding in the loop).
    * Center-aligned sampling (src = (dst + .5)·scale − .5, the
    * align_corners=false convention shared by PIL/OpenCV/torch), edges
    * clamped. The interpolation weight math is exact: each output channel
    * is a sum of four byte×weight products in a 64-bit accumulator with a
    * single rounding shift. */
  def resizeBilinear(w: Int, h: Int, rgb: Array[Byte],
                     nw: Int, nh: Int): Array[Byte] = {
    val out = new Array[Byte](nw * nh * 3)
    val Fp = 16
    val One = 1L << Fp
    // scale in 16.16: src span per dst pixel
    val sxStep = (w.toLong << Fp) / nw
    val syStep = (h.toLong << Fp) / nh
    var y = 0
    while (y < nh) {
      // center-aligned source coordinate, clamped at the borders
      val syFx0 = ((2L * y + 1) * syStep - One) / 2
      val syFx = math.max(0L, math.min(syFx0, (h.toLong - 1) << Fp))
      val y0 = (syFx >> Fp).toInt
      val y1 = math.min(y0 + 1, h - 1)
      val wy = syFx & (One - 1)
      var x = 0
      while (x < nw) {
        val sxFx0 = ((2L * x + 1) * sxStep - One) / 2
        val sxFx = math.max(0L, math.min(sxFx0, (w.toLong - 1) << Fp))
        val x0 = (sxFx >> Fp).toInt
        val x1 = math.min(x0 + 1, w - 1)
        val wx = sxFx & (One - 1)
        val dst = (y * nw + x) * 3
        var c = 0
        while (c < 3) {
          val p00 = rgb((y0 * w + x0) * 3 + c) & 0xff
          val p01 = rgb((y0 * w + x1) * 3 + c) & 0xff
          val p10 = rgb((y1 * w + x0) * 3 + c) & 0xff
          val p11 = rgb((y1 * w + x1) * 3 + c) & 0xff
          val top = p00 * (One - wx) + p01 * wx        // 8.16
          val bot = p10 * (One - wx) + p11 * wx
          val v = (top * (One - wy) + bot * wy + (1L << (2 * Fp - 1))) >> (2 * Fp)
          out(dst + c) = v.toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Center crop to (cw, ch), clamped to the source size. */
  def centerCrop(w: Int, h: Int, rgb: Array[Byte],
                 cw: Int, ch: Int): (Int, Int, Array[Byte]) = {
    val ow = math.min(cw, w)
    val oh = math.min(ch, h)
    val x0 = (w - ow) / 2
    val y0 = (h - oh) / 2
    val out = new Array[Byte](ow * oh * 3)
    var y = 0
    while (y < oh) {
      System.arraycopy(rgb, ((y0 + y) * w + x0) * 3, out, y * ow * 3, ow * 3)
      y += 1
    }
    (ow, oh, out)
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
