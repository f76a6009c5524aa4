package graft.multimodal

/** GIF (87a/89a) decoder — the palette + LZW member of the codec family
  * (CompuServe GIF, public spec; LZW per Welch '84 as profiled for GIF:
  * variable-width codes 3..12 bits, LSB-first bit order, CLEAR/EOI
  * codes, dictionary rebuilt on CLEAR).
  *
  * Scope: still decode of the FIRST image frame to packed RGB —
  * including interlaced images (the 4-pass row shuffle) and local color
  * tables; `frameCount` scans the block stream without decoding, so
  * animated payloads surface their length cheaply. Frame COMPOSITING
  * (disposal methods, partial-frame offsets over a canvas) is out of
  * scope, as is transparency — the first frame's palette indices map
  * straight through the active color table.
  *
  * Defensive by construction like the other codecs: every read is
  * bounds-checked, the LZW dictionary is capped at its spec maximum
  * (4096 codes), and malformed streams return None instead of throwing —
  * a corrupt payload in a 100-TB scan must cost one row, not the task. */
object GifCodec {

  def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 &&
      bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def u16le(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)

  /** Skip a chain of data sub-blocks starting at `p`; returns the offset
    * just past the terminator, or -1 when truncated. */
  private def skipSubBlocks(bytes: Array[Byte], p0: Int): Int = {
    var p = p0
    while (p < bytes.length) {
      val len = u8(bytes, p)
      if (len == 0) return p + 1
      if (p + 1 + len > bytes.length) return -1
      p += 1 + len
    }
    -1
  }

  /** Number of image frames in the payload (descriptor scan, no decode). */
  def frameCount(bytes: Array[Byte]): Int = {
    if (!isGif(bytes) || bytes.length < 13) return 0
    var p = 13 + globalTableBytes(bytes)
    var n = 0
    while (p < bytes.length) {
      u8(bytes, p) match {
        case 0x3b => return n // trailer
        case 0x21 => // extension: label byte then sub-blocks
          if (p + 2 > bytes.length) return n
          p = skipSubBlocks(bytes, p + 2); if (p < 0) return n
        case 0x2c =>
          if (p + 10 > bytes.length) return n
          val lctBytes =
            if ((u8(bytes, p + 9) & 0x80) != 0)
              3 * (2 << (u8(bytes, p + 9) & 0x07)) else 0
          val afterLct = p + 10 + lctBytes
          if (afterLct + 1 > bytes.length) return n
          p = skipSubBlocks(bytes, afterLct + 1); if (p < 0) return n
          n += 1
        case _ => return n
      }
    }
    n
  }

  private def globalTableBytes(bytes: Array[Byte]): Int =
    if ((u8(bytes, 10) & 0x80) != 0) 3 * (2 << (u8(bytes, 10) & 0x07)) else 0

  /** Decode the first frame → (width, height, packed RGB). None for
    * non-GIF bytes or malformed streams. */
  def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (!isGif(bytes) || bytes.length < 13) return None
    val gctLen = globalTableBytes(bytes)
    val gctOff = 13
    if (gctOff + gctLen > bytes.length) return None
    var p = gctOff + gctLen
    while (p < bytes.length) {
      u8(bytes, p) match {
        case 0x3b => return None // trailer before any image
        case 0x21 =>
          if (p + 2 > bytes.length) return None
          p = skipSubBlocks(bytes, p + 2); if (p < 0) return None
        case 0x2c =>
          if (p + 10 > bytes.length) return None
          val w = u16le(bytes, p + 5); val h = u16le(bytes, p + 7)
          val packed = u8(bytes, p + 9)
          val interlaced = (packed & 0x40) != 0
          val lctLen = if ((packed & 0x80) != 0) 3 * (2 << (packed & 0x07)) else 0
          val lctOff = p + 10
          if (lctOff + lctLen > bytes.length) return None
          val (palOff, palLen) =
            if (lctLen > 0) (lctOff, lctLen) else (gctOff, gctLen)
          if (palLen == 0) return None
          if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
          val dataOff = lctOff + lctLen
          if (dataOff + 1 > bytes.length) return None
          val minCode = u8(bytes, dataOff)
          if (minCode < 1 || minCode > 11) return None
          val indices = lzwDecode(bytes, dataOff + 1, minCode, w * h)
            .getOrElse(return None)
          val rgb = new Array[Byte](w * h * 3)
          val nColors = palLen / 3
          var row = 0
          // interlace pass starts/strides per the GIF spec
          val starts = Array(0, 4, 2, 1); val strides = Array(8, 8, 4, 2)
          var pass = 0; var outRow = if (interlaced) starts(0) else 0
          while (row < h) {
            val destRow = if (interlaced) outRow else row
            var x = 0
            while (x < w) {
              val idx = indices(row * w + x)
              if (idx >= nColors) return None
              val q = (destRow * w + x) * 3
              rgb(q) = bytes(palOff + idx * 3)
              rgb(q + 1) = bytes(palOff + idx * 3 + 1)
              rgb(q + 2) = bytes(palOff + idx * 3 + 2)
              x += 1
            }
            row += 1
            if (interlaced) {
              outRow += strides(pass)
              while (pass < 3 && outRow >= h) {
                pass += 1; outRow = starts(pass)
              }
            }
          }
          return Some((w, h, rgb))
        case _ => return None
      }
    }
    None
  }

  /** GIF-profile LZW: decode exactly `need` pixel indices from the data
    * sub-blocks at `p0`. Codes are read LSB-first across sub-block
    * boundaries; width grows 1 past each dictionary fill until 12 bits;
    * CLEAR resets, EOI or satisfied `need` ends. */
  private def lzwDecode(bytes: Array[Byte], p0: Int, minCode: Int,
                        need: Int): Option[Array[Int]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = eoi + 1
    var codeSize = minCode + 1
    val out = new Array[Int](need)
    var produced = 0
    var prev = -1

    // bit reader over the sub-block chain
    var p = p0
    var blockEnd = 0 // exclusive end of current sub-block's data
    var acc = 0L; var accBits = 0
    def refill(): Boolean = {
      while (accBits < codeSize) {
        if (p >= blockEnd) {
          if (p >= bytes.length) return false
          val len = u8(bytes, p)
          if (len == 0) return false // terminator with codes still needed
          p += 1
          if (p + len > bytes.length) return false
          blockEnd = p + len
        }
        acc |= (u8(bytes, p).toLong << accBits)
        accBits += 8
        p += 1
      }
      true
    }
    // start inside the first sub-block
    blockEnd = p0

    val firstOf = new Array[Int](4096) // first index of each code's string
    var i = 0
    while (i < clear) { prefix(i) = -1; suffix(i) = i; firstOf(i) = i; i += 1 }

    def emit(code: Int): Boolean = {
      // walk the chain into a small stack, then unwind
      var stack = List.empty[Int]
      var c = code
      var guard = 0
      while (c >= 0 && guard <= 4096) {
        stack = suffix(c) :: stack; c = prefix(c); guard += 1
      }
      if (guard > 4096) return false
      stack.foreach { s =>
        if (produced < need) { out(produced) = s; produced += 1 }
      }
      true
    }

    while (produced < need) {
      if (!refill()) return None
      val code = (acc & ((1 << codeSize) - 1)).toInt
      acc >>>= codeSize; accBits -= codeSize
      if (code == clear) {
        dictSize = eoi + 1; codeSize = minCode + 1; prev = -1
      } else if (code == eoi) {
        return if (produced == need) Some(out) else None
      } else if (prev < 0) {
        if (code >= dictSize) return None
        if (!emit(code)) return None
        prev = code
      } else {
        val valid = code < dictSize && !(code >= clear && code < eoi + 1)
        if (!valid && code != dictSize) return None
        val newEntryFirst =
          if (code < dictSize) firstOf(code) else firstOf(prev)
        if (dictSize < 4096) {
          prefix(dictSize) = prev
          suffix(dictSize) = newEntryFirst
          firstOf(dictSize) = firstOf(prev)
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        val toEmit = if (code < dictSize) code else return None
        if (!emit(toEmit)) return None
        prev = toEmit
      }
    }
    Some(out)
  }
}
