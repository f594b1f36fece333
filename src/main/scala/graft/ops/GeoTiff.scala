package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GeoTIFF codec for the export sink (SURVEY.md §2.2
  * sink_geotiff_export; reference arcgis.py:60-92): little-endian TIFF
  * carrying two float32 band planes (planar, [[RowsPerStrip]]-row
  * strips, Deflate-compressed by default), the GeoTIFF georeferencing tags
  * (pixel scale + tiepoint + EPSG geokey directory) and the GDAL
  * metadata/nodata ASCII tags that rasterio's writer emits — band
  * descriptions NDVI/EVI and per-band `date`/`variable` items
  * (arcgis.py:85-90), nodata −9999 (arcgis.py:78).
  *
  * Compression: the reference exports LZW (arcgis.py:67-78,
  * `compress='lzw'`); uncompressed float32 frames are ~5-8× larger than
  * a user expects. The default is Adobe Deflate (TIFF compression
  * tag 8, zlib streams per strip via `java.util.zip.Deflater`) —
  * readable by GDAL/rasterio/QGIS exactly like LZW — with a TIFF6 LZW
  * write path (tag 5) behind `encode(lzw = true)` for byte-level
  * reference parity. [[decode]] handles tags 1, 5 and 8.
  *
  * Pure byte-level functions: [[encode]] runs inside the
  * `foreachPartition` writer on executors; [[decode]] backs the
  * ExportSpec parse-back check (no raster library exists in this
  * environment, and a dependency-free codec keeps the sink honest).
  */
object GeoTiff {

  val Nodata: Float = -9999.0f

  /** Strip height: frames deflate/inflate in bounded chunks instead of
    * one giant per-band buffer, so a 100×-grid frame streams through
    * fixed memory on both the write and the read path (and a reader can
    * fetch a row range without inflating the whole band). 64 rows ×
    * width × 4 bytes keeps strips in the 100 KB–1 MB band GDAL also
    * targets. */
  val RowsPerStrip = 64

  private val TShort = 3
  private val TLong = 4
  private val TAscii = 2
  private val TDouble = 12

  private val CompNone = 1
  private[graft] val CompLzw = 5
  private val CompDeflate = 8

  /** zlib-compress one strip (TIFF compression 8 payload). */
  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(raw)
    d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] =
    Zlib.inflateExact(data, expected, "TIFF strip")

  // ------------------------------------------------------------- TIFF LZW
  // The reference's literal codec (arcgis.py:76, compress='lzw'): MSB-
  // first bit packing, 9→12-bit codes, ClearCode 256 / EOI 257, and the
  // spec's "early change" (the code width bumps one entry early vs the
  // GIF timing — TIFF6 §13, libtiff convention, validated against the
  // JDK's javax.imageio TIFF codec in ExportSpec). Deflate remains the
  // default write path; LZW sits behind a flag for byte-level reference
  // parity.

  /** TIFF-flavor LZW compression of one strip. */
  private[graft] def lzwEncode(raw: Array[Byte]): Array[Byte] =
    Lzw.encode(raw, msbFirst = true, encBumpAt = w => 1 << w)

  /** Inverse of [[lzwEncode]] (and of any spec-conforming TIFF LZW
    * writer without the horizontal-differencing predictor). */
  private[graft] def lzwDecode(data: Array[Byte], expected: Int): Array[Byte] =
    Lzw.decode(data, expected, msbFirst = true,
      decBumpAt = w => (1 << w) - 1, label = "TIFF")

  /** Encode one date frame: exactly two band planes (NDVI, EVI — the
    * reference's fixed band set), row-major `height * width` float32
    * with [[Nodata]] fill, georeferenced by the north-up [[GridSpec]]
    * affine. Each band plane is chunked into [[RowsPerStrip]]-row strips
    * compressed independently; `lzw` selects TIFF compression 5 for
    * byte-level parity with the reference's `compress='lzw'`
    * (arcgis.py:76), Deflate (tag 8) being the default. */
  def encode(grid: GridSpec, date: String,
      bands: Seq[(String, Array[Float])],
      compress: Boolean = true,
      rowsPerStrip: Int = RowsPerStrip,
      lzw: Boolean = false): Array[Byte] = {
    require(bands.length == 2, s"2-band frames only, got ${bands.length}")
    val w = grid.width
    val h = grid.height
    bands.foreach { case (n, d) =>
      require(d.length == w * h, s"band $n: ${d.length} != ${w * h}") }

    val metaXml = {
      val items = bands.zipWithIndex.map { case ((name, _), i) =>
        s"""<Item name="DESCRIPTION" sample="$i" role="description">$name</Item>""" +
          s"""<Item name="date" sample="$i">$date</Item>""" +
          s"""<Item name="variable" sample="$i">$name</Item>"""
      }.mkString
      s"<GDALMetadata>$items</GDALMetadata>"
    }
    val metaBytes = (metaXml + "\u0000").getBytes("US-ASCII")
    val metaPadded = metaBytes.length + (metaBytes.length & 1)
    val nodataBytes = "-9999\u0000".getBytes("US-ASCII")

    // bounded strips per band plane, compressed independently
    val rps = math.max(1, math.min(rowsPerStrip, h))
    val stripsPerBand = (h + rps - 1) / rps
    val codec = if (!compress) CompNone else if (lzw) CompLzw else CompDeflate
    val strips: Seq[Array[Byte]] = bands.flatMap { case (_, data) =>
      (0 until stripsPerBand).map { si =>
        val r0 = si * rps
        val r1 = math.min(h, r0 + rps)
        val raw = ByteBuffer.allocate((r1 - r0) * w * 4)
          .order(ByteOrder.LITTLE_ENDIAN)
        var i = r0 * w
        while (i < r1 * w) { raw.putFloat(data(i)); i += 1 }
        codec match {
          case CompDeflate => deflate(raw.array())
          case CompLzw => lzwEncode(raw.array())
          case _ => raw.array()
        }
      }
    }
    val nStrips = strips.length
    // word-aligned strip placement (TIFF offsets should be even)
    var cursor = 8
    val stripOff = strips.map { s =>
      val o = cursor; cursor += s.length + (s.length & 1); o
    }
    val auxStart = cursor
    val stripOffsetsPos = auxStart
    val stripCountsPos = auxStart + nStrips * 4
    val pxScalePos = stripCountsPos + nStrips * 4
    val tiePos = pxScalePos + 24
    val geoKeyPos = tiePos + 48
    val metaPos = geoKeyPos + 32
    val nodataPos = metaPos + metaPadded
    val ifdPos = nodataPos + 6
    val nEntries = 16
    val total = ifdPos + 2 + nEntries * 12 + 4

    val b = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    // header
    b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdPos)
    // band strips (padded to even offsets)
    strips.foreach { s =>
      b.put(s)
      if ((s.length & 1) == 1) b.put(0.toByte)
    }
    // out-of-line values
    stripOff.foreach(b.putInt)                    // StripOffsets
    strips.foreach(s => b.putInt(s.length))       // StripByteCounts
    b.putDouble(grid.pxLon).putDouble(-grid.pxLat).putDouble(0.0) // pixel scale
    // tiepoint: raster (0,0,0) pins to (west, north, 0)
    b.putDouble(0.0).putDouble(0.0).putDouble(0.0)
    b.putDouble(grid.west).putDouble(grid.north).putDouble(0.0)
    // geokeys: directory header + ModelType=geographic, RasterType=area,
    // GeographicType=EPSG:4326
    Seq(1, 1, 0, 3, 1024, 0, 1, 2, 1025, 0, 1, 1, 2048, 0, 1, 4326)
      .foreach(v => b.putShort(v.toShort))
    b.put(metaBytes)
    if ((metaBytes.length & 1) == 1) b.put(0.toByte)
    b.put(nodataBytes)
    // IFD (tags ascending)
    b.putShort(nEntries.toShort)
    def entry(tag: Int, typ: Int, count: Int)(value: ByteBuffer => Unit): Unit = {
      b.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      val before = b.position()
      value(b)
      while (b.position() < before + 4) b.put(0.toByte)
    }
    entry(256, TLong, 1)(_.putInt(w))             // ImageWidth
    entry(257, TLong, 1)(_.putInt(h))             // ImageLength
    entry(258, TShort, 2)(x => { x.putShort(32); x.putShort(32) }) // BitsPerSample
    entry(259, TShort, 1)(_.putShort(codec.toShort)) // Compression: none|lzw|deflate
    entry(262, TShort, 1)(_.putShort(1))          // Photometric: BlackIsZero
    entry(273, TLong, nStrips)(_.putInt(stripOffsetsPos))
    entry(277, TShort, 1)(_.putShort(2))          // SamplesPerPixel
    entry(278, TLong, 1)(_.putInt(rps))           // RowsPerStrip
    entry(279, TLong, nStrips)(_.putInt(stripCountsPos))
    entry(284, TShort, 1)(_.putShort(2))          // PlanarConfiguration: planar
    entry(339, TShort, 2)(x => { x.putShort(3); x.putShort(3) }) // SampleFormat: float
    entry(33550, TDouble, 3)(_.putInt(pxScalePos))  // ModelPixelScale
    entry(33922, TDouble, 6)(_.putInt(tiePos))      // ModelTiepoint
    entry(34735, TShort, 16)(_.putInt(geoKeyPos))   // GeoKeyDirectory
    entry(42112, TAscii, metaBytes.length)(_.putInt(metaPos)) // GDAL_METADATA
    entry(42113, TAscii, 6)(_.putInt(nodataPos))    // GDAL_NODATA
    b.putInt(0) // no next IFD
    b.array()
  }

  final case class Decoded(width: Int, height: Int,
      pixelScaleX: Double, pixelScaleY: Double,
      tieLon: Double, tieLat: Double,
      epsg: Int, nodata: String, metadataXml: String,
      bands: Seq[Array[Float]], compression: Int = 1,
      /** Entry count of StripOffsets (tag 273) — the physical strip
        * layout as written, `bands × ceil(height / RowsPerStrip)`. */
      nStrips: Int = 0)

  /** Parse back what [[encode]] writes (same subset of TIFF). */
  def decode(bytes: Array[Byte]): Decoded = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(b.get(0) == 'I'.toByte && b.get(1) == 'I'.toByte
      && b.getShort(2) == 42, "not a little-endian TIFF")
    val ifd = b.getInt(4)
    val n = b.getShort(ifd) & 0xffff
    val entries = (0 until n).map { i =>
      val e = ifd + 2 + i * 12
      (b.getShort(e) & 0xffff) ->
        ((b.getShort(e + 2) & 0xffff, b.getInt(e + 4), e + 8))
    }.toMap
    def scalar(tag: Int): Int = {
      val (typ, _, at) = entries(tag)
      if (typ == TShort) b.getShort(at) & 0xffff else b.getInt(at)
    }
    def offsetOf(tag: Int): Int = b.getInt(entries(tag)._3)
    def ascii(tag: Int): String = {
      val (_, cnt, at) = entries(tag)
      val off = b.getInt(at)
      val arr = new Array[Byte](cnt)
      ByteBuffer.wrap(bytes, off, cnt).get(arr)
      new String(arr, "US-ASCII").takeWhile(_ != '\u0000')
    }
    def doubles(tag: Int, cnt: Int): Seq[Double] = {
      val off = offsetOf(tag)
      (0 until cnt).map(i => b.getDouble(off + i * 8))
    }
    val w = scalar(256)
    val h = scalar(257)
    val planes = scalar(277)
    val compression = scalar(259)
    require(compression == CompNone || compression == CompLzw
      || compression == CompDeflate,
      s"unsupported TIFF compression $compression (codec reads 1, 5 or 8)")
    // RowsPerStrip: absent or >= height means one strip per band (the
    // pre-chunking layout this codec used to write)
    val rps = entries.get(278).map(_ => scalar(278)).filter(_ > 0)
      .map(math.min(_, h)).getOrElse(h)
    val stripsPerBand = (h + rps - 1) / rps
    val stripOffAt = offsetOf(273)
    val stripCntAt = offsetOf(279)
    val bands = (0 until planes).map { p =>
      val plane = new Array[Byte](w * h * 4)
      var at = 0
      for (si <- 0 until stripsPerBand) {
        val idx = p * stripsPerBand + si
        val off = b.getInt(stripOffAt + idx * 4)
        val cnt = b.getInt(stripCntAt + idx * 4)
        val rows = math.min(rps, h - si * rps)
        val packed = java.util.Arrays.copyOfRange(bytes, off, off + cnt)
        val raw = compression match {
          case CompDeflate => inflate(packed, w * rows * 4)
          case CompLzw => lzwDecode(packed, w * rows * 4)
          case _ => packed
        }
        System.arraycopy(raw, 0, plane, at, raw.length)
        at += raw.length
      }
      val fb = ByteBuffer.wrap(plane).order(ByteOrder.LITTLE_ENDIAN)
      Array.tabulate(w * h)(i => fb.getFloat(i * 4))
    }
    val scale = doubles(33550, 3)
    val tie = doubles(33922, 6)
    val geoKeyOff = offsetOf(34735)
    val nKeys = b.getShort(geoKeyOff + 6) & 0xffff
    val epsg = (0 until nKeys).collectFirst {
      case i if (b.getShort(geoKeyOff + 8 + i * 8) & 0xffff) == 2048 =>
        b.getShort(geoKeyOff + 8 + i * 8 + 6) & 0xffff
    }.getOrElse(0)
    Decoded(w, h, scale.head, scale(1), tie(3), tie(4), epsg,
      ascii(42113), ascii(42112), bands, compression,
      nStrips = entries.get(273).map(_._2).getOrElse(0))
  }

  /** src_geotiff_read over real bytes (SURVEY.md §2.1): binaryFile scan
    * of a GeoTIFF directory, per-file decode on the executors, long
    * relation (date, y, x, ndvi, evi) with the −9999 fill back as NULL —
    * the inverse of Export.writeGeoTiffs. The scan carries only (path,
    * content), decode parallelizes per file, and a name predicate
    * (pathGlobFilter / date glob) prunes files before any byte is
    * parsed. */
  def readCube(s: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.tif").load(dir)
      .select(org.apache.spark.sql.functions.col("path"),
        org.apache.spark.sql.functions.col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val dec = decode(bytes)
        val date = path.split('/').last.stripSuffix(".tif")
        def opt(v: Float): Option[Double] =
          if (v == Nodata) None else Some(v.toDouble)
        for (y <- 0 until dec.height; x <- 0 until dec.width) yield
          (date, y, x, opt(dec.bands.head(y * dec.width + x)),
            opt(dec.bands(1)(y * dec.width + x)))
      }
      .toDF("date", "y", "x", "ndvi", "evi")
  }
}
