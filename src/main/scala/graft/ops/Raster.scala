package graft.ops

import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

/** Dependency-free raster image codecs for the visualization sinks
  * (SURVEY.md §2.2 sink_png_frames / sink_gif; reference
  * visualize_dataset.py:343-355 frame export, 357-414 animated GIF).
  * The reference renders NDVI/EVI frames through matplotlib's RdYlGn
  * colormap (visualize_dataset.py:102, 119: `cmap='RdYlGn',
  * vmin=-0.2, vmax=1.0` for NDVI, vmax=2.0 for EVI) and assembles a
  * 500 ms/frame looping GIF with PIL (visualize_dataset.py:398-404).
  * Like [[GeoTiff]], these are pure byte-level functions that run
  * inside executor-side writers — no image library exists in this
  * environment, and the decoders back the spec round-trips.
  */
object Raster {

  // ------------------------------------------------------------ colormap
  /** ColorBrewer RdYlGn-11 anchors — the data behind matplotlib's
    * 'RdYlGn' (public ColorBrewer palette). */
  private val RdYlGnAnchors: Array[(Int, Int, Int)] = Array(
    (165, 0, 38), (215, 48, 39), (244, 109, 67), (253, 174, 97),
    (254, 224, 139), (255, 255, 191), (217, 239, 139), (166, 217, 106),
    (102, 189, 99), (26, 152, 80), (0, 104, 55))

  /** 255-entry RdYlGn lookup table (linear interpolation across the 11
    * anchors); index 255 is reserved for nodata. Packed 0xRRGGBB. */
  val RdYlGn: Array[Int] = Array.tabulate(255) { i =>
    val t = i * 10.0 / 254.0
    val j = math.min(t.toInt, 9)
    val f = t - j
    val (r0, g0, b0) = RdYlGnAnchors(j)
    val (r1, g1, b1) = RdYlGnAnchors(j + 1)
    def mix(a: Int, b: Int) = math.round(a + (b - a) * f).toInt
    (mix(r0, r1) << 16) | (mix(g0, g1) << 8) | mix(b0, b1)
  }

  /** Palette index for a value under (vmin, vmax) normalization:
    * 0..254 through the colormap, 255 for missing — matplotlib's
    * Normalize + under/over clamping (visualize_dataset.py:102). */
  def colorIndex(v: Double, vmin: Double, vmax: Double): Int =
    if (v.isNaN) 255
    else {
      val t = (v - vmin) / (vmax - vmin)
      val c = math.max(0.0, math.min(1.0, t))
      math.round(c * 254).toInt
    }

  // ----------------------------------------------------------------- PNG
  /** Minimal RGBA PNG encoder: 8-bit color type 6, filter 0 scanlines,
    * one zlib IDAT. Nodata pixels carry alpha 0 (matplotlib renders
    * masked cells transparent over the figure background). */
  object Png {

    private val Signature =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

    private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
        data: Array[Byte]): Unit = {
      def be(v: Int): Array[Byte] = Array(
        (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
      out.write(be(data.length))
      val tb = typ.getBytes(StandardCharsets.US_ASCII)
      out.write(tb)
      out.write(data)
      val crc = new CRC32()
      crc.update(tb)
      crc.update(data)
      out.write(be(crc.getValue.toInt))
    }

    /** `rgba(i)` is 0xAARRGGBB row-major. */
    def encode(width: Int, height: Int, rgba: Array[Int]): Array[Byte] = {
      require(rgba.length == width * height,
        s"${rgba.length} pixels != $width x $height")
      val out = new java.io.ByteArrayOutputStream()
      out.write(Signature)
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(width).putInt(height)
        .put(8.toByte).put(6.toByte) // bit depth 8, color type RGBA
        .put(0.toByte).put(0.toByte).put(0.toByte)
      chunk(out, "IHDR", ihdr.array())
      val raw = new Array[Byte](height * (1 + width * 4))
      var p = 0
      for (y <- 0 until height) {
        raw(p) = 0 // filter: None
        p += 1
        for (x <- 0 until width) {
          val v = rgba(y * width + x)
          raw(p) = ((v >>> 16) & 0xff).toByte     // R
          raw(p + 1) = ((v >>> 8) & 0xff).toByte  // G
          raw(p + 2) = (v & 0xff).toByte          // B
          raw(p + 3) = ((v >>> 24) & 0xff).toByte // A
          p += 4
        }
      }
      val d = new Deflater()
      d.setInput(raw)
      d.finish()
      val zs = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) zs.write(buf, 0, d.deflate(buf))
      d.end()
      chunk(out, "IDAT", zs.toByteArray)
      chunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Parse back what [[encode]] writes (filter-0 RGBA only). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      require(bytes.take(8).sameElements(Signature), "not a PNG")
      val b = java.nio.ByteBuffer.wrap(bytes)
      b.position(8)
      var w = 0
      var h = 0
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        val len = b.getInt
        val tb = new Array[Byte](4)
        b.get(tb)
        val typ = new String(tb, StandardCharsets.US_ASCII)
        val data = new Array[Byte](len)
        b.get(data)
        val storedCrc = b.getInt
        val crc = new CRC32()
        crc.update(tb)
        crc.update(data)
        require(crc.getValue.toInt == storedCrc, s"bad CRC on $typ")
        typ match {
          case "IHDR" =>
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt
            h = ib.getInt
            require(ib.get() == 8 && ib.get() == 6, "decoder reads 8-bit RGBA only")
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _ => ()
        }
      }
      val raw = Zlib.inflateExact(idat.toByteArray, h * (1 + w * 4), "PNG IDAT")
      val px = new Array[Int](w * h)
      for (y <- 0 until h) {
        val row = y * (1 + w * 4)
        require(raw(row) == 0, s"row $y uses filter ${raw(row)}, decoder reads 0")
        for (x <- 0 until w) {
          val p = row + 1 + x * 4
          px(y * w + x) = ((raw(p + 3) & 0xff) << 24) |
            ((raw(p) & 0xff) << 16) | ((raw(p + 1) & 0xff) << 8) |
            (raw(p + 2) & 0xff)
        }
      }
      (w, h, px)
    }
  }

  // ----------------------------------------------------------------- GIF
  /** Animated GIF89a encoder: one global 256-color table, NETSCAPE
    * infinite loop, per-frame graphic control (centisecond delay,
    * PIL's `duration` -- visualize_dataset.py:398-404), GIF-flavor LZW
    * (LSB-first packing, no early change). Frames are full-canvas
    * palette-index rasters. */
  object Gif {

    /** GIF LZW with 8-bit min code size: codes start at 9 bits,
      * Clear=256, EOI=257, LSB-first packing, and the GIF width
      * timing — encoder widens after its add at nextCode == (1<<w)+1,
      * the decoder (one table entry behind) at 1<<w. One code LATER
      * than TIFF's early-change pair; validated against the JDK's
      * javax.imageio GIF codec in RasterSpec. */
    private[graft] def lzwEncode(data: Array[Byte]): Array[Byte] =
      Lzw.encode(data, msbFirst = false, encBumpAt = w => (1 << w) + 1)

    private[graft] def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] =
      Lzw.decode(data, expected, msbFirst = false,
        decBumpAt = w => 1 << w, label = "GIF")

    /** One frame: full-canvas palette indices + delay in centiseconds. */
    final case class Frame(indices: Array[Byte], delayCs: Int)

    /** `palette`: 256 packed 0xRRGGBB entries. `loop = 0` is forever
      * (PIL `loop=0`, visualize_dataset.py:403). */
    def encode(width: Int, height: Int, palette: Array[Int],
        frames: Seq[Frame], loop: Int = 0): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      encodeTo(out, width, height, palette, frames.iterator, loop)
      out.toByteArray
    }

    /** Streaming form: frames consumed one at a time and written
      * straight to `out` (a GIF is header + GCT + per-frame blocks +
      * trailer, so nothing forces the sequence to be in memory at
      * once) — what lets the sink assemble a long series from
      * `toLocalIterator` without collecting every frame. */
    def encodeTo(sink: java.io.OutputStream, width: Int, height: Int,
        palette: Array[Int], frames: Iterator[Frame], loop: Int = 0): Unit = {
      require(palette.length == 256, s"palette ${palette.length} != 256")
      require(frames.hasNext, "at least one frame")
      val out = sink
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
      out.write("GIF89a".getBytes(StandardCharsets.US_ASCII))
      u16(width)
      u16(height)
      out.write(0xf7) // GCT present, 8-bit resolution, 256 entries
      out.write(255)  // background = nodata index
      out.write(0)    // square pixels
      palette.foreach { c =>
        out.write((c >>> 16) & 0xff); out.write((c >>> 8) & 0xff); out.write(c & 0xff)
      }
      // NETSCAPE2.0 loop extension
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes(StandardCharsets.US_ASCII))
      out.write(3); out.write(1); u16(loop); out.write(0)
      frames.foreach { f =>
        require(f.indices.length == width * height,
          s"frame ${f.indices.length} != $width x $height")
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0) // disposal none, no transparency
        u16(f.delayCs)
        out.write(0) // transparent index (unused)
        out.write(0)
        out.write(0x2c) // image descriptor: full canvas, no local table
        u16(0); u16(0); u16(width); u16(height); out.write(0)
        out.write(8) // LZW min code size
        val lzw = lzwEncode(f.indices)
        var off = 0
        while (off < lzw.length) {
          val n = math.min(255, lzw.length - off)
          out.write(n)
          out.write(lzw, off, n)
          off += n
        }
        out.write(0) // block terminator
      }
      out.write(0x3b) // trailer
      out.flush()
    }

    /** Parse back what [[encode]] writes. Returns (width, height,
      * palette, frames). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Int], Seq[Frame]) = {
      val magic = new String(bytes, 0, 6, StandardCharsets.US_ASCII)
      require(magic == "GIF89a" || magic == "GIF87a", s"not a GIF: $magic")
      var p = 6
      def u8(): Int = { val v = bytes(p) & 0xff; p += 1; v }
      def u16(): Int = { val v = (bytes(p) & 0xff) | ((bytes(p + 1) & 0xff) << 8); p += 2; v }
      val w = u16()
      val h = u16()
      val packed = u8()
      require((packed & 0x80) != 0, "no global color table")
      val gctSize = 2 << (packed & 7)
      u8(); u8() // background, aspect
      val palette = Array.fill(gctSize)((u8() << 16) | (u8() << 8) | u8())
      val frames = Seq.newBuilder[Frame]
      var delay = 0
      var done = false
      while (!done) {
        u8() match {
          case 0x3b => done = true
          case 0x21 => // extension
            val label = u8()
            if (label == 0xf9) {
              require(u8() == 4, "bad GCE size")
              u8() // flags
              delay = u16()
              u8() // transparent index
              require(u8() == 0, "GCE not terminated")
            } else {
              var n = u8()
              while (n != 0) { p += n; n = u8() }
            }
          case 0x2c =>
            u16(); u16()
            val fw = u16()
            val fh = u16()
            require(fw == w && fh == h, "decoder reads full-canvas frames only")
            val iflags = u8()
            require((iflags & 0x80) == 0, "decoder reads GCT frames only")
            require(u8() == 8, "decoder reads 8-bit min code size only")
            val data = new java.io.ByteArrayOutputStream()
            var n = u8()
            while (n != 0) { data.write(bytes, p, n); p += n; n = u8() }
            val raw = lzwDecode(data.toByteArray, w * h)
            // GIF interlacing (flag 0x40): the stream carries rows in
            // four passes (every 8th from 0, from 4, every 4th from 2,
            // every 2nd from 1) — restore natural row order
            val px =
              if ((iflags & 0x40) == 0) raw
              else {
                val order = (0 until h by 8) ++ (4 until h by 8) ++
                  (2 until h by 4) ++ (1 until h by 2)
                val out = new Array[Byte](w * h)
                order.zipWithIndex.foreach { case (row, src) =>
                  System.arraycopy(raw, src * w, out, row * w, w)
                }
                out
              }
            frames += Frame(px, delay)
          case other =>
            throw new IllegalArgumentException(f"unexpected GIF block 0x$other%02x")
        }
      }
      (w, h, palette, frames.result())
    }
  }
}
