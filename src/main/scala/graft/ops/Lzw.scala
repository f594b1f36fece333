package graft.ops

/** Shared variable-width LZW core for the TIFF ([[GeoTiff]]) and GIF
  * ([[Raster.Gif]]) codecs. The two formats share everything — 8-bit
  * symbols, Clear=256 / EOI=257, 12-bit cap, table reset, the KwKwK
  * case, the encoder's phantom table entry at flush — and differ in
  * exactly two knobs:
  *
  *   - bit packing: TIFF packs codes MSB-first, GIF LSB-first;
  *   - width timing: with `nextCode` counted AFTER an add, the GIF
  *     encoder widens at `(1<<w)+1` and its decoder (one table entry
  *     behind) at `1<<w`; TIFF's "early change" (TIFF6 §13, libtiff)
  *     shifts BOTH one code earlier: encoder `1<<w`, decoder
  *     `(1<<w)-1`.
  *
  * Both conventions are validated against the JDK's independent
  * `javax.imageio` GIF/TIFF codecs in RasterSpec/ExportSpec — a
  * round-trip through this pair alone cannot catch a timing bug,
  * because encoder and decoder would drift in lockstep.
  */
/** Shared zlib inflate for the PNG and TIFF decoders: exact expected
  * size, and a stall check that fails on truncated or
  * preset-dictionary streams instead of spinning (all input is set up
  * front, so a zero-byte round can never become progress later). */
private[ops] object Zlib {
  def inflateExact(data: Array[Byte], expected: Int, label: String): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var at = 0
    var stalled = false
    while (at < expected && !inf.finished() && !stalled) {
      val n = inf.inflate(out, at, expected - at)
      stalled = n == 0
      at += n
    }
    inf.end()
    require(at == expected, s"$label inflated $at bytes, expected $expected")
    out
  }
}

private[ops] object Lzw {

  private val Clear = 256
  private val Eoi = 257

  /** `encBumpAt(w)` = the post-add `nextCode` at which the encoder
    * switches to w+1 bits. GIF: `(1<<w)+1`; TIFF: `1<<w`. */
  def encode(data: Array[Byte], msbFirst: Boolean,
      encBumpAt: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      if (msbFirst) bitBuf = (bitBuf << width) | code
      else bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) {
        if (msbFirst) out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        else { out.write((bitBuf & 0xff).toInt); bitBuf >>>= 8 }
        bitCnt -= 8
      }
    }
    var table = new java.util.HashMap[Int, Int]()
    var nextCode = 258
    def key(prefix: Int, k: Int): Int = (prefix << 8) | k
    def bumped(): Unit =
      if (nextCode == encBumpAt(width) && width < 12) width += 1
    put(Clear)
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val k = data(i) & 0xff
      if (prefix < 0) prefix = k
      else {
        val ext = table.getOrDefault(key(prefix, k), -1)
        if (ext >= 0) prefix = ext
        else {
          put(prefix)
          if (nextCode >= 4093) {
            // table full: flush + reset (decoders mirror on Clear)
            put(Clear)
            table = new java.util.HashMap[Int, Int]()
            nextCode = 258
            width = 9
          } else {
            table.put(key(prefix, k), nextCode)
            nextCode += 1
            bumped()
          }
          prefix = k
        }
      }
      i += 1
    }
    if (prefix >= 0) {
      put(prefix)
      // phantom table entry for the flushed code: the decoder adds one
      // while processing it, so the width rules stay in lockstep only
      // if the encoder counts it too (libtiff/giflib do the same)
      nextCode += 1
      bumped()
    }
    put(Eoi)
    if (bitCnt > 0) {
      if (msbFirst) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
      else out.write((bitBuf & 0xff).toInt)
    }
    out.toByteArray
  }

  /** `decBumpAt(w)` = the post-add `nextCode` at which the decoder
    * switches to w+1 bits — one below the encoder's trigger, because
    * the decoder's table lags the encoder's by one entry. */
  def decode(data: Array[Byte], expected: Int, msbFirst: Boolean,
      decBumpAt: Int => Int, label: String): Array[Byte] = {
    val out = new Array[Byte](expected)
    var at = 0
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var width = 9
    def read(): Int = {
      while (bitCnt < width) {
        require(pos < data.length, s"$label LZW stream truncated (no EOI)")
        if (msbFirst) bitBuf = (bitBuf << 8) | (data(pos) & 0xff)
        else bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
      }
      val code =
        if (msbFirst) ((bitBuf >>> (bitCnt - width)) & ((1 << width) - 1)).toInt
        else {
          val c = (bitBuf & ((1 << width) - 1)).toInt
          bitBuf >>>= width
          c
        }
      bitCnt -= width
      code
    }
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Byte](4096)
    var nextCode = 258
    def emit(code: Int): Byte = {
      var c = code
      var len = 0
      while (c >= 258) { len += 1; c = prefixOf(c) }
      len += 1
      require(at + len <= expected, s"$label LZW overflow: $at + $len > $expected")
      var w = at + len - 1
      c = code
      while (c >= 258) { out(w) = byteOf(c); w -= 1; c = prefixOf(c) }
      out(w) = c.toByte
      at += len
      out(w)
    }
    var old = -1
    var done = false
    while (!done && at < expected) {
      val code = read()
      if (code == Eoi) done = true
      else if (code == Clear) {
        nextCode = 258
        width = 9
        old = -1
      } else if (old < 0) {
        require(code < 256, s"$label LZW: non-literal first code $code")
        emit(code)
        old = code
      } else {
        val first =
          if (code < nextCode) emit(code)
          else {
            // KwKwK: string(old) + firstChar(string(old))
            require(code == nextCode, s"$label LZW: code $code ahead of table")
            var c = old
            while (c >= 258) c = prefixOf(c)
            val f = c.toByte
            val start = at
            emit(old)
            require(at < expected, s"$label LZW overflow in KwKwK")
            out(at) = f
            at += 1
            out(start)
          }
        // accept streams that fill the table to the 12-bit limit even
        // though our own encoder resets earlier (an early Clear is
        // always legal; a fuller table must still decode)
        if (nextCode < 4096) {
          prefixOf(nextCode) = old
          byteOf(nextCode) = first
          nextCode += 1
          if (nextCode == decBumpAt(width) && width < 12) width += 1
        }
        old = code
      }
    }
    require(at == expected, s"$label LZW produced $at bytes, expected $expected")
    out
  }
}
