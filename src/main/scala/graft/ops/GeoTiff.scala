package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal GeoTIFF codec for the export sink (SURVEY.md §2.2
  * sink_geotiff_export; reference arcgis.py:60-92): little-endian
  * baseline TIFF carrying two float32 band planes (uncompressed,
  * planar), the GeoTIFF georeferencing tags (pixel scale + tiepoint +
  * EPSG geokey directory) and the GDAL metadata/nodata ASCII tags that
  * rasterio's writer emits — band descriptions NDVI/EVI and per-band
  * `date`/`variable` items (arcgis.py:85-90), nodata −9999
  * (arcgis.py:78).
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

  /** Encode one date frame: exactly two band planes (NDVI, EVI — the
    * reference's fixed band set), row-major `height * width` float32
    * with [[Nodata]] fill, georeferenced by the north-up [[GridSpec]]
    * affine. */
  def encode(grid: GridSpec, date: String,
      bands: Seq[(String, Array[Float])]): Array[Byte] = {
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

    val stripLen = w * h * 4
    val stripOff = Array(8, 8 + stripLen)
    val auxStart = 8 + 2 * stripLen
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
    // band planes
    bands.foreach { case (_, data) => data.foreach(b.putFloat) }
    // out-of-line values
    stripOff.foreach(b.putInt)                    // StripOffsets
    b.putInt(stripLen).putInt(stripLen)           // StripByteCounts
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
    entry(259, TShort, 1)(_.putShort(1))          // Compression: none
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
      bands: Seq[Array[Float]])

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
    val stripOffAt = offsetOf(273)
    val bands = (0 until planes).map { p =>
      val off = b.getInt(stripOffAt + p * 4)
      Array.tabulate(w * h)(i => b.getFloat(off + i * 4))
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
      ascii(42113), ascii(42112), bands)
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
