package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.ops.{Export, Merge, PixelOps, Pixels}

/** Sink round-trips (SURVEY.md §2.2): date-partitioned cube writes with
  * partition pruning on read-back, downsample+fill export frames, events
  * JSON, and the index/style metadata records. */
class ExportSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  private def cube = PixelOps.withIndices(Pixels.pixels(spark, sf))
    .filter(year(col("date")) === 1996)
    .select(col("time"), col("y"), col("x"),
      col("ndvi_c").as("ndvi"), col("evi_c").as("evi"))

  test("cube sink writes date partitions and read-back round-trips the rows") {
    val out = tmp("cube")
    Export.writeCube(cube, out)
    val back = spark.read.parquet(out)
    assert(back.count() == cube.count())
    // partition column materialized → a date predicate prunes partitions
    val oneDay = back.filter(col("p_date") === lit("1996-03-15"))
    val expect = cube.filter(to_date(col("time")) === lit("1996-03-15"))
    assert(oneDay.count() == expect.count())
    // the predicate must land in PartitionFilters (directory pruning),
    // NOT as a data filter — at 100 TB this is the difference between
    // listing one partition and scanning the whole table
    val scan = oneDay.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [") && scan.contains("p_date"),
      s"date predicate did not prune partitions:\n$scan")
    val prunedParts = oneDay.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(prunedParts.exists(_ == 1), s"expected exactly 1 partition read, got $prunedParts")
  }

  test("granule cache sink partitions by tile, date-sorted within; overwrite invalidates") {
    val out = tmp("cache")
    val g = PixelOps.withIndices(Pixels.pixels(spark, sf))
      .filter(col("tile_id") === 1 && year(col("date")) === 1996)
      .select(col("tile_id"), col("time"), col("y"), col("x"), col("ndvi_c"))
    assert(g.count() > 0)
    Export.writeGranuleCache(g, out)
    val back = spark.read.parquet(out)
    val n1 = back.count()
    assert(back.columns.contains("p_date"),
      "date column lost from the cache layout")
    // one tile => ONE partition dir and a bounded file count (no
    // per-day directory explosion)
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("tile_id="))
    assert(dirs.length == 1, s"expected 1 tile dir, got ${dirs.length}")
    assert(dirs.head.listFiles().count(_.getName.startsWith("part-")) <= 4,
      "per-day small-files layout crept back")
    // rows INSIDE a part file are time-ordered — the row-group pruning
    // contract. The partitioned-write planner eliminates any user sort
    // that does not lead with the partition column, so a sort-order
    // regression silently voids pruning; this catches it at the file
    // level (within one tile, (p_date, time) order == time order).
    val part = dirs.head.listFiles().filter(_.getName.startsWith("part-")).head
    val times = spark.read.parquet(part.getAbsolutePath)
      .selectExpr("unix_micros(CAST(time AS TIMESTAMP)) AS t")
      .collect().map(_.getLong(0))
    assert(times.length > 1 && times.sliding(2).forall(p => p(1) >= p(0)),
      "granule-cache file rows are not date-sorted (pruning contract broken)")
    Export.writeGranuleCache(g, out) // idempotent overwrite
    assert(spark.read.parquet(out).count() == n1)
  }

  test("export frame: downsample reindexes the grid and fill removes NULLs") {
    val f = Export.exportFrame(cube, downsample = 2)
    assert(f.filter(col("ndvi").isNull || col("evi").isNull).count() == 0)
    val (maxY, maxX) = f.agg(max("y"), max("x")).as[(Int, Int)].head()
    assert(maxY <= 15 && maxX <= 15)
    // every kept coordinate came from an even source coordinate
    assert(f.count() ==
      cube.filter(col("y") % 2 === 0 && col("x") % 2 === 0).count())
  }

  test("netcdf source: write→read round-trips the cube relation exactly") {
    val grid = ops.Resample.SrcGrid
    val out = tmp("ncsrc") + "/cube.nc"
    Export.writeNetcdf(cube, out, grid)
    val back = Tables.cubeFromNetcdf(spark, out)
    // the container stores one frame per DATE with the latest scene
    // winning per cell (dateFrames), values narrowed to float32 — the
    // read-back must equal exactly that relation, with fill cells NULL
    val expected = cube
      .select(to_date(col("time")).as("date"), col("y"), col("x"),
        col("time"),
        col("ndvi").cast("double").as("nd"), col("evi").cast("double").as("ev"))
      .groupBy("date", "y", "x")
      .agg(expr("max_by(named_struct('nd', nd, 'ev', ev), time)").as("v"))
      .select(col("date"), col("y"), col("x"),
        col("v.nd").cast("float").as("ndvi"), col("v.ev").cast("float").as("evi"))
      .filter(col("ndvi").isNotNull || col("evi").isNotNull)
    val got = back.filter(col("ndvi").isNotNull || col("evi").isNotNull)
      .orderBy("date", "y", "x").collect()
    val want = expected.orderBy("date", "y", "x").collect()
    assert(got.length == want.length,
      s"round-trip cell count ${got.length} != ${want.length}")
    assert(got.sameElements(want), "NetCDF round-trip drifted from the cube")
    // the full grid materializes: every (date, y, x) cell exists, fill
    // cells as NULL
    val nDates = cube.select(to_date(col("time"))).distinct().count()
    assert(back.count() == nDates * grid.height * grid.width)
  }

  test("netcdf sink: classic CDF both decoders parse back to the cube") {
    val grid = ops.Resample.SrcGrid
    val out = tmp("nc") + "/cube.nc"
    Export.writeNetcdf(cube, out, grid)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    val p = ops.Netcdf.read(bytes)
    assert(p.s.dims == Seq(("time", 0), ("y", 32), ("x", 32)))
    val dates = cube.select(date_format(col("time"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").as[String].collect()
    assert(p.numRecs == dates.length && dates.nonEmpty)
    // time coordinate: epoch days, in date order
    val tb = java.nio.ByteBuffer.wrap(p.data("time"))
    val times = Array.fill(p.numRecs)(tb.getInt()).toSeq
    assert(times == dates.toSeq.map(d =>
      java.time.LocalDate.parse(d).toEpochDay.toInt))
    // coordinate variables carry pixel-center affine coords
    val yb = java.nio.ByteBuffer.wrap(p.data("y"))
    assert(yb.getDouble() == grid.north + 0.5 * grid.pxLat)
    val xb = java.nio.ByteBuffer.wrap(p.data("x"))
    assert(xb.getDouble() == grid.west + 0.5 * grid.pxLon)
    // ndvi payload vs the relation: same-day dedup (latest scene wins),
    // −9999 fill — count and sum of valid cells must agree
    def stats(name: String): (Int, Int, Double) = {
      val bb = java.nio.ByteBuffer.wrap(p.data(name))
      var n = 0; var nF = 0; var s = 0.0
      while (bb.hasRemaining) {
        val v = bb.getFloat()
        n += 1
        if (v == -9999f) nF += 1 else s += v.toDouble
      }
      (n, nF, s)
    }
    val (n, nFill, vSum) = stats("ndvi")
    assert(n == dates.length * 32 * 32)
    val (expN, expSum) = cube
      .select(date_format(col("time"), "yyyy-MM-dd").as("d"),
        col("y"), col("x"), col("time"), col("ndvi"))
      .groupBy("d", "y", "x").agg(expr("max_by(ndvi, time)").as("v"))
      .filter(col("v").isNotNull)
      .agg(count(lit(1)), sum(col("v").cast("float").cast("double")))
      .as[(Long, Double)].head()
    assert(n - nFill == expN, s"valid cells ${n - nFill} != relation $expN")
    assert(math.abs(vSum - expSum) < 2e-3, s"ndvi sum $vSum != $expSum")
    // independent cross-decode: the devtools parser (second
    // implementation, second language, from the CDF spec) must agree
    // on structure and on the value digest bit-for-bit
    import scala.sys.process._
    val json = Seq("python3", "devtools/nccheck.py", out).!!
    assert(json.contains(""""version": 1"""), json)
    assert(json.contains(s""""numrecs": ${dates.length}"""), json)
    assert(json.contains(""""time": 0"""), json) // record dim
    val dig = ("\"ndvi\": \\{\"n\": (\\d+), \"n_fill\": (\\d+), " +
      "\"sum\": (-?[0-9.]+)").r
    val m = dig.findFirstMatchIn(json)
      .getOrElse(fail(s"no ndvi digest in: $json"))
    assert(m.group(1).toInt == n && m.group(2).toInt == nFill,
      s"python sees n=${m.group(1)} fill=${m.group(2)}, JVM $n/$nFill")
    assert(m.group(3).toDouble == math.rint(vSum * 1000) / 1000,
      s"python sum ${m.group(3)} != JVM ${math.rint(vSum * 1000) / 1000}")
  }

  test("netcdf codec: forced CDF-2 (64-bit offsets) round-trips both decoders") {
    import graft.ops.Netcdf._
    val schema = Schema(
      dims = Seq(("time", 0), ("x", 3)),
      gatts = Seq("title" -> TextAtt("cdf2 path")),
      vars = Seq(
        NcVar("time", Seq(0), NcInt, Nil),
        NcVar("x", Seq(1), NcDouble, Nil),
        NcVar("v", Seq(0, 1), NcFloat,
          Seq("_FillValue" -> FloatAtt(Array(-9999f))))))
    def b(f: java.nio.ByteBuffer => Unit): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(64); f(bb)
      java.util.Arrays.copyOf(bb.array(), bb.position())
    }
    val xs = b(bb => Seq(1.5, 2.5, 3.5).foreach(bb.putDouble))
    val recs = Seq(
      Seq(b(_.putInt(10)), b(bb => Seq(1f, 2f, 3f).foreach(bb.putFloat))),
      Seq(b(_.putInt(20)), b(bb => Seq(4f, -9999f, 6f).foreach(bb.putFloat))))
    val file = java.nio.file.Paths.get(tmp("cdf2"), "two.nc")
    val out = java.nio.file.Files.newOutputStream(file)
    try write(out, schema, 2, Map("x" -> xs), recs.iterator, forceCdf2 = true)
    finally out.close()
    val p = read(java.nio.file.Files.readAllBytes(file))
    assert(p.numRecs == 2 && p.s.dims == schema.dims)
    val vb = java.nio.ByteBuffer.wrap(p.data("v"))
    assert(Array.fill(6)(vb.getFloat()).toSeq ==
      Seq(1f, 2f, 3f, 4f, -9999f, 6f))
    val tb2 = java.nio.ByteBuffer.wrap(p.data("time"))
    assert((tb2.getInt(), tb2.getInt()) == (10, 20))
    // the independent parser accepts the 64-bit-offset layout too
    import scala.sys.process._
    val json = Seq("python3", "devtools/nccheck.py", file.toString).!!
    assert(json.contains(""""version": 2""") &&
      json.contains(""""numrecs": 2"""), json)
    assert(json.contains(""""n_fill": 1"""), json)
  }

  test("geotiff sink writes parseable georeferenced frames with nodata fill") {
    val out = tmp("gtiff")
    // one frame: pin to the earliest timestamp of one day so (y, x) is unique
    val day = cube.filter(to_date(col("time")) === lit("1996-03-15"))
    val t0 = day.agg(min("time")).head().get(0)
    val frame = day.filter(col("time") === lit(t0))
    Export.writeGeoTiffs(frame, out, ops.Resample.SrcGrid)
    val f = new java.io.File(out, "1996-03-15.tif")
    assert(f.exists, s"frame file missing in $out")
    val dec = ops.GeoTiff.decode(Files.readAllBytes(f.toPath))
    assert(dec.width == 32 && dec.height == 32)
    assert(dec.nodata == "-9999")
    assert(dec.epsg == 4326)
    // georeferencing round-trips the from_bounds affine
    assert(dec.tieLon == ops.Resample.SrcGrid.west)
    assert(dec.tieLat == ops.Resample.SrcGrid.north)
    assert(dec.pixelScaleX == ops.Resample.SrcGrid.pxLon)
    assert(dec.pixelScaleY == -ops.Resample.SrcGrid.pxLat)
    // band descriptions + per-band date/variable tags (arcgis.py:85-90)
    for (tag <- Seq(">NDVI<", ">EVI<", ">1996-03-15<"))
      assert(dec.metadataXml.contains(tag), s"missing $tag in ${dec.metadataXml}")
    // pixel payload: valid cells round-trip the float value, masked and
    // absent cells decode as the -9999 fill
    val rows = frame.select("y", "x", "ndvi")
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2).toFloat))).toMap
    assert(dec.bands.size == 2)
    for (y <- 0 until 32; x <- 0 until 32) {
      val got = dec.bands.head(y * 32 + x)
      rows.get((y, x)).flatten match {
        case Some(v) => assert(got == v, s"($y,$x): $got != $v")
        case None => assert(got == ops.GeoTiff.Nodata, s"($y,$x): $got not nodata")
      }
    }
    // the distributed read source round-trips the sink: full grid back,
    // nodata as NULL, valid cells at float precision
    val back = ops.GeoTiff.readCube(spark, out)
    assert(back.count() == 32 * 32)
    assert(back.select("date").distinct().as[String].collect().toSeq
      == Seq("1996-03-15"))
    val backMap = back.select("y", "x", "ndvi").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for (y <- 0 until 32; x <- 0 until 32) {
      (backMap((y, x)), rows.get((y, x)).flatten) match {
        case (Some(b), Some(v)) =>
          assert(math.abs(b - v) < 1e-6, s"($y,$x): $b != $v")
        case (None, None) => ()
        case other => fail(s"($y,$x): read-back null mismatch $other")
      }
    }
  }

  test("geotiff strips are bounded: tall frames chunk at RowsPerStrip and round-trip") {
    // 150 rows -> 3 strips per band (64+64+22); every codec path must
    // reassemble the plane bit for bit from bounded strips
    val g = ops.GridSpec(west = -50.0, north = 10.0,
      pxLon = 0.01, pxLat = -0.01, width = 40, height = 150)
    val vals = Array.tabulate(g.width * g.height)(i =>
      if (i % 11 == 0) ops.GeoTiff.Nodata else ((i * 31) % 997) / 997.0f)
    val bands = Seq("NDVI" -> vals, "EVI" -> vals.map(-_))
    for (compress <- Seq(true, false)) {
      val dec = ops.GeoTiff.decode(ops.GeoTiff.encode(g, "2024-06-01", bands,
        compress = compress))
      assert(dec.width == 40 && dec.height == 150)
      assert(dec.nStrips == 6, s"150 rows must chunk 3 strips x 2 bands, got ${dec.nStrips}")
      assert(dec.bands.head.sameElements(vals), s"compress=$compress NDVI strips garbled")
      assert(dec.bands(1).sameElements(bands(1)._2), s"compress=$compress EVI strips garbled")
    }
    // decode stays backward-compatible with the single-strip layout
    // (RowsPerStrip = full height)
    val single = ops.GeoTiff.decode(ops.GeoTiff.encode(g, "2024-06-01", bands,
      rowsPerStrip = g.height))
    assert(single.bands.head.sameElements(vals), "single-strip layout regressed")
  }

  test("geotiff LZW write path (tag 5) round-trips, including repetitive payloads") {
    val g = ops.GridSpec(west = 0.0, north = 0.0,
      pxLon = 0.01, pxLat = -0.01, width = 64, height = 130)
    // three payload shapes: constant (maximal table reuse), repetitive,
    // and pseudo-random (worst case, exercises table resets)
    val rnd = new scala.util.Random(42)
    val payloads = Seq(
      Array.fill(g.width * g.height)(1.5f),
      Array.tabulate(g.width * g.height)(i => (i % 17) / 17.0f),
      Array.fill(g.width * g.height)(rnd.nextFloat()))
    payloads.zipWithIndex.foreach { case (vals, pi) =>
      val bands = Seq("NDVI" -> vals, "EVI" -> vals.map(v => -v))
      val enc = ops.GeoTiff.encode(g, "2024-06-01", bands, lzw = true)
      val dec = ops.GeoTiff.decode(enc)
      assert(dec.compression == 5, s"payload $pi: wrong compression tag")
      assert(dec.bands.head.sameElements(vals), s"payload $pi: NDVI LZW garbled")
      assert(dec.bands(1).sameElements(bands(1)._2), s"payload $pi: EVI LZW garbled")
    }
    // the sink-level flag writes tag-5 frames the distributed source
    // reads back (reference parity end to end: arcgis.py:76)
    val out = Files.createTempDirectory("gtiff-lzw").toString
    val day = cube.filter(to_date(col("time")) === lit("1996-03-15"))
    val t0 = day.agg(min("time")).head().get(0)
    Export.writeGeoTiffs(day.filter(col("time") === lit(t0)), out,
      ops.Resample.SrcGrid, lzw = true)
    val sunk = ops.GeoTiff.decode(Files.readAllBytes(
      new java.io.File(out, "1996-03-15.tif").toPath))
    assert(sunk.compression == 5, s"sink wrote tag ${sunk.compression}")
    assert(ops.GeoTiff.readCube(spark, out).count() == 32 * 32)
    // and the raw LZW codec survives sizes that cross the 9->10->11->12
    // bit-width boundaries and the table-reset point
    val big = Array.tabulate(300000)(i => ((i * 7919) ^ (i >> 3)).toByte)
    assert(ops.GeoTiff.lzwDecode(ops.GeoTiff.lzwEncode(big), big.length)
      .sameElements(big), "LZW boundary-crossing round-trip failed")
    for (n <- Seq(0, 1, 2, 253, 254, 255, 256, 300, 511, 1000)) {
      val data = Array.tabulate(n)(i => (i % 251).toByte)
      assert(ops.GeoTiff.lzwDecode(ops.GeoTiff.lzwEncode(data), n)
        .sameElements(data), s"LZW round-trip failed at n=$n")
    }
  }

  test("TIFF LZW agrees with the JDK imageio TIFF codec in both directions") {
    // our encoder/decoder pair round-trips regardless of width timing,
    // so the libtiff-convention check needs an independent codec: the
    // JDK ships a TIFF plugin. Forward: a minimal 8-bit gray TIFF
    // carrying our LZW strip must read back pixel-perfect. Reverse: a
    // JDK-written LZW TIFF's strip must decode through our lzwDecode.
    import java.nio.{ByteBuffer, ByteOrder}
    val (w, h) = (128, 128) // 16k random bytes: all width bumps + reset
    val rnd = new scala.util.Random(13)
    val pixels = Array.fill(w * h)(rnd.nextInt(256).toByte)

    // --- forward: wrap our LZW stream in a minimal grayscale TIFF
    val lzw = ops.GeoTiff.lzwEncode(pixels)
    val forward = {
      val ifdPos = 8 + lzw.length + (lzw.length & 1)
      val entries = Seq[(Int, Int, Int, Int)](
        (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 1), (273, 4, 1, 8), (277, 3, 1, 1), (278, 4, 1, h),
        (279, 4, 1, lzw.length))
      val b = ByteBuffer.allocate(ifdPos + 2 + entries.size * 12 + 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      b.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdPos)
      b.put(lzw)
      if ((lzw.length & 1) == 1) b.put(0.toByte)
      b.putShort(entries.size.toShort)
      entries.foreach { case (tag, typ, cnt, v) =>
        b.putShort(tag.toShort).putShort(typ.toShort).putInt(cnt)
        if (typ == 3) { b.putShort(v.toShort); b.putShort(0) } else b.putInt(v)
      }
      b.putInt(0)
      b.array()
    }
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(forward))
    assert(img != null, "JDK TIFF reader refused our LZW strip")
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRaster.getSample(x, y, 0) & 0xff) ==
        (pixels(y * w + x) & 0xff),
        s"($x,$y): JDK decoded our TIFF LZW stream differently")

    // --- reverse: JDK writes LZW, our decoder reads the strip
    val gray = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    gray.getRaster.setDataElements(0, 0, w, h, pixels)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("tif").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionType("LZW")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(gray, null, null), param)
    ios.close()
    val jdkTiff = baos.toByteArray
    // parse the JDK file's IFD for strip offsets/counts + RowsPerStrip
    val jb = ByteBuffer.wrap(jdkTiff).order(
      if (jdkTiff(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    val ifd = jb.getInt(4)
    val n = jb.getShort(ifd) & 0xffff
    val tags = (0 until n).map { i =>
      val e = ifd + 2 + i * 12
      (jb.getShort(e) & 0xffff) -> ((jb.getShort(e + 2) & 0xffff, jb.getInt(e + 4), e + 8))
    }.toMap
    def arr(tag: Int): Seq[Int] = {
      val (typ, cnt, at) = tags(tag)
      val size = if (typ == 3) 2 else 4
      val base = if (size * cnt <= 4) at else jb.getInt(at)
      (0 until cnt).map(i =>
        if (typ == 3) jb.getShort(base + i * 2) & 0xffff else jb.getInt(base + i * 4))
    }
    assert(arr(259).head == 5, s"JDK wrote compression ${arr(259).head}, not LZW")
    // no predictor (or predictor 1): our decoder does not undo differencing
    val predictor = if (tags.contains(317)) arr(317).head else 1
    assert(predictor == 1, s"JDK used predictor $predictor; disable it in the test")
    val rps = arr(278).head
    val offs = arr(273)
    val cnts = arr(279)
    val got = new Array[Byte](w * h)
    var at = 0
    offs.indices.foreach { si =>
      val rows = math.min(rps, h - si * rps)
      val strip = ops.GeoTiff.lzwDecode(
        java.util.Arrays.copyOfRange(jdkTiff, offs(si), offs(si) + cnts(si)),
        w * rows)
      System.arraycopy(strip, 0, got, at, strip.length)
      at += strip.length
    }
    assert(got.sameElements(pixels), "our decoder misread the JDK's LZW strips")
  }

  test("geotiff frames deflate-compress: measurably smaller, identical content") {
    val g = ops.Resample.SrcGrid
    // repetitive-but-nontrivial payload, like real raster frames
    val vals = Array.tabulate(g.width * g.height)(i =>
      if (i % 7 == 0) ops.GeoTiff.Nodata else (i % 100) / 100.0f)
    val bands = Seq("NDVI" -> vals,
      "EVI" -> vals.map(v => if (v == ops.GeoTiff.Nodata) v else -v))
    val comp = ops.GeoTiff.encode(g, "2024-06-01", bands)
    val raw = ops.GeoTiff.encode(g, "2024-06-01", bands, compress = false)
    assert(comp.length < (raw.length * 8) / 10,
      s"deflate frame ${comp.length}B not measurably smaller than raw ${raw.length}B")
    val dc = ops.GeoTiff.decode(comp)
    val dr = ops.GeoTiff.decode(raw)
    assert(dc.compression == 8 && dr.compression == 1)
    // identical pixels and identical georeferencing/metadata either way
    dc.bands.zip(dr.bands).foreach { case (a, b) => assert(a.sameElements(b)) }
    assert(dc.tieLon == dr.tieLon && dc.tieLat == dr.tieLat)
    assert(dc.pixelScaleX == dr.pixelScaleX && dc.epsg == dr.epsg)
    assert(dc.metadataXml == dr.metadataXml && dc.nodata == dr.nodata)
  }

  test("downsampled geotiff export rescales the affine transform (arcgis.py:47-48)") {
    val out = tmp("gtiffds")
    // full-year cube, several scenes per date — the writer's
    // latest-scene-wins dedup makes multi-scene frames well-defined; the
    // export-side stride-2 downsample reindexes the grid, so the frame
    // must carry the matching 2x-coarser affine (the synthetic pixel
    // parity correlates with date, so single-day slices can lose every
    // even-even cell)
    val frame = Export.exportFrame(cube, downsample = 2)
    assert(frame.count() > 0, "downsampled frame is empty")
    val d0 = frame
      .select(date_format(col("time"), "yyyy-MM-dd").as("d"))
      .orderBy("d").head().getString(0)
    val g2 = ops.Resample.SrcGrid.downsample(2)
    Export.writeGeoTiffs(frame, out, g2)
    val dec = ops.GeoTiff.decode(Files.readAllBytes(
      new java.io.File(out, s"$d0.tif").toPath))
    assert(dec.width == 16 && dec.height == 16)
    assert(dec.pixelScaleX == ops.Resample.SrcGrid.pxLon * 2)
    assert(dec.pixelScaleY == -ops.Resample.SrcGrid.pxLat * 2)
    // anchor unchanged: the top-left corner of the coarser grid is the
    // same geographic point
    assert(dec.tieLon == ops.Resample.SrcGrid.west)
    assert(dec.tieLat == ops.Resample.SrcGrid.north)
    // exportFrame already filled nodata, so no -9999 from absent cells
    // beyond what the fill wrote; every cell decodes
    assert(dec.bands.head.length == 256)
  }

  test("events JSON sink writes readable records") {
    val out = tmp("events")
    Export.writeEventsJson(ops.Events.abruptDrops(spark, sf), out)
    val back = spark.read.json(out)
    assert(back.count() > 0)
    assert(back.columns.toSet.contains("type"))
  }

  test("index record carries dims, date list, bands, and nodata") {
    val rec = Export.indexRecord(spark, cube).collect().head
    assert(rec.getAs[Int]("height") == 32)
    assert(rec.getAs[Int]("width") == 32)
    assert(rec.getAs[collection.Seq[String]]("dates").nonEmpty)
    assert(rec.getAs[collection.Seq[String]]("bands").toSeq == Seq("ndvi", "evi"))
    assert(rec.getAs[Double]("nodata") == -9999.0)
  }

  test("style sink emits the fixed 6-class ramp") {
    val out = tmp("style")
    Export.writeStyleJson(spark, out)
    assert(spark.read.json(out).count() == 6)
  }

  test("packed-shard sink lays the corpus out by shard, matching the t15 manifest") {
    val out = tmp("shards")
    Export.writePackedShards(spark, sf, out)
    val back = spark.read.parquet(out)
    val manifest = graft.ops.TextOps.sequencePack(spark, sf)
      .select("shard_id", "n_docs").as[(Long, Long)].collect().toMap
    // directory layout is one partition per shard
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).toSet
    assert(dirs == manifest.keySet.map(id => s"shard_id=$id"),
      s"shard directories $dirs do not match the manifest")
    // per-shard doc counts equal the manifest, no docs lost
    val counts = back.groupBy("shard_id")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(counts == manifest, s"shard membership drifted: $counts vs $manifest")
    // partition pruning: a shard filter reaches the scan as a partition
    // filter (a loader reads one shard without listing the rest)
    val p = back.filter(col("shard_id") === 0).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("shard_id"),
      s"shard filter did not prune at the scan:\n$p")
  }

  test("curated shards ship exactly the funnel survivors, budget-dense") {
    val out = tmp("curated_shards")
    Export.writeCuratedShards(spark, sf, out)
    val back = spark.read.parquet(out)
    val survivors = graft.ops.TextOps.curatedDocs(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val shipped = back.select("doc_id").as[Long].collect().toSet
    assert(shipped == survivors,
      s"shards ship ${shipped.size} docs, funnel kept ${survivors.size}")
    // offsets recompute over the survivor set: every shard but the last
    // reaches the token budget once its last doc is counted in. A
    // shard's fill is bounded below by budget - (maxTok - 1) — the
    // worst case is its last doc's full length spilling into the next
    // shard — so the slack derives from the survivor set's longest doc,
    // not a magic constant that a longer fixture doc would break.
    val perShard = back
      .select(col("shard_id"), size(split(col("text"), " ")).cast("long").as("tok"))
      .groupBy("shard_id").agg(sum("tok").as("tokens"), max("tok").as("max_tok"))
      .orderBy("shard_id").as[(Long, Long, Long)].collect()
    val maxTok = perShard.map(_._3).max
    perShard.dropRight(1).foreach { case (id, tokens, _) =>
      assert(tokens >= graft.ops.TextOps.PackBudget - (maxTok - 1),
        s"shard $id underfilled at $tokens tokens despite later shards existing")
    }
  }
}
