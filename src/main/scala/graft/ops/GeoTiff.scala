package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GeoTIFF codec for the export sink (SURVEY.md §2.2
  * sink_geotiff_export; reference arcgis.py:60-92): little-endian TIFF
  * carrying two float32 band planes (planar, one strip per band,
  * Deflate-compressed by default), the GeoTIFF georeferencing tags
  * (pixel scale + tiepoint + EPSG geokey directory) and the GDAL
  * metadata/nodata ASCII tags that rasterio's writer emits — band
  * descriptions NDVI/EVI and per-band `date`/`variable` items
  * (arcgis.py:85-90), nodata −9999 (arcgis.py:78).
  *
  * Compression: the reference exports LZW (arcgis.py:67-78,
  * `compress='lzw'`); uncompressed float32 frames are ~5-8× larger than
  * a user expects. The dependency-free equivalent is Adobe Deflate
  * (TIFF compression tag 8, zlib streams per strip via
  * `java.util.zip.Deflater`) — readable by GDAL/rasterio/QGIS exactly
  * like LZW. [[decode]] handles both tag 1 (none) and tag 8.
  *
  * Pure byte-level functions: [[encode]] runs inside the
  * `foreachPartition` writer on executors; [[decode]] backs the
  * ExportSpec parse-back check (no raster library exists in this
  * environment, and a dependency-free codec keeps the sink honest).
  */
object GeoTiff {

  val Nodata: Float = -9999.0f

  private val TShort = 3
  private val TLong = 4
  private val TAscii = 2
  private val TDouble = 12

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

  private def inflate(data: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new Array[Byte](expected)
    var at = 0
    while (at < expected && !inf.finished())
      at += inf.inflate(out, at, expected - at)
    inf.end()
    require(at == expected, s"inflated $at bytes, expected $expected")
    out
  }

  /** Encode one date frame: exactly two band planes (NDVI, EVI — the
    * reference's fixed band set), row-major `height * width` float32
    * with [[Nodata]] fill, georeferenced by the north-up [[GridSpec]]
    * affine. */
  def encode(grid: GridSpec, date: String,
      bands: Seq[(String, Array[Float])],
      compress: Boolean = true): Array[Byte] = {
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

    // one strip per band plane; Deflate shrinks each independently
    val strips: Seq[Array[Byte]] = bands.map { case (_, data) =>
      val raw = ByteBuffer.allocate(data.length * 4).order(ByteOrder.LITTLE_ENDIAN)
      data.foreach(raw.putFloat)
      if (compress) deflate(raw.array()) else raw.array()
    }
    // word-aligned strip placement (TIFF offsets should be even)
    var cursor = 8
    val stripOff = strips.map { s =>
      val o = cursor; cursor += s.length + (s.length & 1); o
    }
    val auxStart = cursor
    val stripOffsetsPos = auxStart
    val stripCountsPos = auxStart + 8
    val pxScalePos = auxStart + 16
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
    entry(259, TShort, 1)(_.putShort(if (compress) 8 else 1)) // Compression: deflate | none
    entry(262, TShort, 1)(_.putShort(1))          // Photometric: BlackIsZero
    entry(273, TLong, 2)(_.putInt(stripOffsetsPos))
    entry(277, TShort, 1)(_.putShort(2))          // SamplesPerPixel
    entry(278, TLong, 1)(_.putInt(h))             // RowsPerStrip
    entry(279, TLong, 2)(_.putInt(stripCountsPos))
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
      bands: Seq[Array[Float]], compression: Int = 1)

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
    require(compression == 1 || compression == 8,
      s"unsupported TIFF compression $compression (codec writes 1 or 8)")
    val stripOffAt = offsetOf(273)
    val stripCntAt = offsetOf(279)
    val bands = (0 until planes).map { p =>
      val off = b.getInt(stripOffAt + p * 4)
      val cnt = b.getInt(stripCntAt + p * 4)
      val raw =
        if (compression == 8)
          inflate(java.util.Arrays.copyOfRange(bytes, off, off + cnt), w * h * 4)
        else java.util.Arrays.copyOfRange(bytes, off, off + cnt)
      val fb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
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
      ascii(42113), ascii(42112), bands, compression)
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
