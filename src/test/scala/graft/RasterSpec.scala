package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.ops.{Export, PixelOps, Pixels, Raster}

/** Visualization sinks (SURVEY.md §2.2 sink_png_frames / sink_gif):
  * colormap fidelity, PNG and GIF codec round-trips across the LZW
  * width boundaries, and the distributed frame/animation sinks against
  * the pixel relation. */
class RasterSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cube = PixelOps.withIndices(Pixels.pixels(spark, sf))
    .filter(year(col("date")) === 1996)
    .select(col("time"), col("y"), col("x"),
      col("ndvi_c").as("ndvi"), col("evi_c").as("evi"))

  test("RdYlGn LUT hits the ColorBrewer anchors and the index mapping clamps") {
    assert(Raster.RdYlGn.length == 255)
    assert(Raster.RdYlGn(0) == 0xa50026, "low end is not RdYlGn red")
    assert(Raster.RdYlGn(254) == 0x006837, "high end is not RdYlGn green")
    assert(Raster.RdYlGn(127) == 0xffffbf, "midpoint is not the yellow anchor")
    // matplotlib Normalize semantics: clamp under/over, NaN -> bad (255)
    assert(Raster.colorIndex(-5.0, -0.2, 1.0) == 0)
    assert(Raster.colorIndex(5.0, -0.2, 1.0) == 254)
    assert(Raster.colorIndex(-0.2, -0.2, 1.0) == 0)
    assert(Raster.colorIndex(1.0, -0.2, 1.0) == 254)
    assert(Raster.colorIndex(Double.NaN, -0.2, 1.0) == 255)
    // monotone: higher NDVI never maps to a lower index
    val idx = (0 to 100).map(i => Raster.colorIndex(-0.2 + i * 0.012, -0.2, 1.0))
    assert(idx == idx.sorted, "colormap index is not monotone in the value")
  }

  test("PNG encodes a parseable, CRC-clean RGBA image that round-trips") {
    val rnd = new scala.util.Random(7)
    val (w, h) = (37, 23) // deliberately not multiples of anything
    val px = Array.fill(w * h)(rnd.nextInt())
    val (dw, dh, back) = Raster.Png.decode(Raster.Png.encode(w, h, px))
    assert(dw == w && dh == h)
    assert(back.sameElements(px), "PNG pixel round-trip failed")
  }

  test("GIF LZW round-trips across width boundaries, table reset and KwKwK runs") {
    // constant runs exercise KwKwK; the big pseudo-random block crosses
    // the 9->10->11->12 bit widths and the 4094 table reset
    for (n <- Seq(0, 1, 2, 253, 254, 255, 256, 511, 512, 1000)) {
      val data = Array.tabulate(n)(i => (i % 251).toByte)
      assert(Raster.Gif.lzwDecode(Raster.Gif.lzwEncode(data), n)
        .sameElements(data), s"GIF LZW failed at n=$n")
    }
    val runs = Array.fill(5000)(42.toByte)
    assert(Raster.Gif.lzwDecode(Raster.Gif.lzwEncode(runs), runs.length)
      .sameElements(runs), "GIF LZW failed on a constant run")
    val big = Array.tabulate(300000)(i => ((i * 7919) ^ (i >> 3)).toByte)
    assert(Raster.Gif.lzwDecode(Raster.Gif.lzwEncode(big), big.length)
      .sameElements(big), "GIF LZW failed crossing width/reset boundaries")
  }

  test("animated GIF round-trips frames, palette, and per-frame delays") {
    val (w, h) = (40, 25)
    val palette = Raster.RdYlGn :+ 0xffffff
    val rnd = new scala.util.Random(11)
    val frames = (0 until 4).map { f =>
      Raster.Gif.Frame(Array.tabulate(w * h)(i =>
        ((i + f * 31) % 256).toByte), 50 + f)
    }
    val bytes = Raster.Gif.encode(w, h, palette, frames)
    assert(new String(bytes.take(6), "US-ASCII") == "GIF89a")
    val (dw, dh, dpal, dframes) = Raster.Gif.decode(bytes)
    assert(dw == w && dh == h)
    assert(dpal.sameElements(palette))
    assert(dframes.size == 4)
    dframes.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.delayCs == want.delayCs, s"frame $i delay")
      assert(got.indices.sameElements(want.indices), s"frame $i pixels")
    }
    // random-noise frame: worst case for the LZW table
    val noisy = Raster.Gif.Frame(Array.fill(w * h)(rnd.nextInt(256).toByte), 50)
    val (_, _, _, nf) = Raster.Gif.decode(Raster.Gif.encode(w, h, palette, Seq(noisy)))
    assert(nf.head.indices.sameElements(noisy.indices))
  }

  test("JDK imageio accepts our PNG and GIF byte-for-byte (independent codec oracle)") {
    // a round-trip through our own encoder/decoder pair cannot catch an
    // LZW width-timing drift (both sides would drift in lockstep); the
    // JDK's GIF/PNG codecs are a genuinely independent implementation
    val rnd = new scala.util.Random(5)
    val (w, h) = (128, 128) // 16k random pixels: crosses 9->10->11->12 bit
                            // widths AND the 4093 table reset
    val palette = Raster.RdYlGn :+ 0xffffff
    val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val gif = Raster.Gif.encode(w, h, palette, Seq(Raster.Gif.Frame(idx, 50)))
    val gimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(gimg != null, "JDK refused our GIF")
    assert(gimg.getWidth == w && gimg.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val want = 0xff000000 | palette(idx(y * w + x) & 0xff)
      assert(gimg.getRGB(x, y) == want,
        f"GIF ($x,$y): JDK read 0x${gimg.getRGB(x, y)}%08x, we wrote 0x$want%08x")
    }
    val px = Array.fill(w * h)(rnd.nextInt())
    val png = Raster.Png.encode(w, h, px)
    val pimg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(pimg != null, "JDK refused our PNG")
    for (y <- 0 until h; x <- 0 until w)
      assert(pimg.getRGB(x, y) == px(y * w + x), s"PNG ($x,$y) mismatch")
  }

  test("our GIF decoder reads a JDK-encoded GIF (reverse direction)") {
    val (w, h) = (96, 80)
    val rnd = new scala.util.Random(9)
    val idx = Array.fill(w * h)(rnd.nextInt(256).toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256,
      Array.tabulate(256)(i => ((i * 37) % 256).toByte),
      Array.tabulate(256)(i => ((i * 11) % 256).toByte),
      Array.tabulate(256)(i => ((i * 3) % 256).toByte))
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    img.getRaster.setDataElements(0, 0, w, h, idx)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", baos), "JDK has no GIF writer?")
    val (dw, dh, dpal, frames) = Raster.Gif.decode(baos.toByteArray)
    assert(dw == w && dh == h && frames.size == 1)
    // compare COLORS, not raw indices: the writer may reorder its table
    for (i <- 0 until w * h)
      assert(dpal(frames.head.indices(i) & 0xff) ==
        (cm.getRGB(idx(i) & 0xff) & 0xffffff),
        s"pixel $i color mismatch against the JDK encoder")
  }

  test("PNG frame sink renders the reference colormap semantics per date") {
    val out = Files.createTempDirectory("png-frames").toString
    val day = cube.filter(to_date(col("time")) === lit("1996-03-15"))
    val t0 = day.agg(min("time")).head().get(0)
    val frame = day.filter(col("time") === lit(t0))
    Export.writePngFrames(frame, out, ops.Resample.SrcGrid)
    val ndviPng = Paths.get(out, "ndvi_1996-03-15.png")
    val eviPng = Paths.get(out, "evi_1996-03-15.png")
    assert(Files.exists(ndviPng) && Files.exists(eviPng), s"frames missing in $out")
    val (w, h, px) = Raster.Png.decode(Files.readAllBytes(ndviPng))
    assert(w == 32 && h == 32)
    val vals = frame.select("y", "x", "ndvi").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for (y <- 0 until 32; x <- 0 until 32) {
      val got = px(y * 32 + x)
      vals.get((y, x)).flatten match {
        case Some(v) =>
          val want = 0xff000000 | Raster.RdYlGn(Raster.colorIndex(v, -0.2, 1.0))
          assert(got == want, f"($y,$x): 0x$got%08x != 0x$want%08x for v=$v")
        case None =>
          assert((got >>> 24) == 0, f"($y,$x): missing cell not transparent: 0x$got%08x")
      }
    }
  }

  test("image sinks fail fast past the frame-byte budget (writer OOM guard)") {
    // a grid whose frames exceed the default 256 MiB budget (2^29 B for
    // GIF at 1 B/px, 4x that for PNG), against a cube whose EXECUTION
    // would throw — proving the guard fires before any job is planned
    val big = ops.Resample.SrcGrid.copy(width = 1 << 15, height = 1 << 14)
    val poisoned = cube.withColumn("ndvi",
      expr("assert_true(false)").cast("double"))
    val out = Files.createTempDirectory("frame-guard")
    val e1 = intercept[IllegalArgumentException] {
      Export.writeGif(poisoned, out.resolve("a.gif").toString, big)
    }
    assert(e1.getMessage.contains("downsample"),
      s"guard message does not name the remedy: ${e1.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Export.writePngFrames(poisoned, out.toString, big)
    }
    assert(e2.getMessage.contains("maxFrameBytes"))
    assert(!Files.exists(out.resolve("a.gif")), "guard left partial output")
    // the budget is configurable: a 32x32 frame (1 KiB) rejected at 512 B
    sys.props("graft.maxFrameBytes") = "512"
    try intercept[IllegalArgumentException] {
      Export.writeGif(cube, out.resolve("b.gif").toString, ops.Resample.SrcGrid)
    } finally sys.props -= "graft.maxFrameBytes"
  }

  test("GIF sink assembles the chronological looping animation") {
    val out = Paths.get(Files.createTempDirectory("gif").toString, "animation.gif")
    Export.writeGif(cube, out.toString, ops.Resample.SrcGrid)
    val (w, h, palette, frames) = Raster.Gif.decode(Files.readAllBytes(out))
    assert(w == 32 && h == 32)
    assert(palette.length == 256 && palette(255) == 0xffffff)
    val expectDates = cube.select(date_format(col("time"), "yyyy-MM-dd"))
      .distinct().as[String].collect().sorted
    assert(frames.size == expectDates.length,
      s"${frames.size} frames != ${expectDates.length} dates")
    assert(frames.forall(_.delayCs == 50), "PIL duration=500ms -> 50cs per frame")
    // first frame pixels match the engine-side mapping for the first date
    val day = cube.filter(date_format(col("time"), "yyyy-MM-dd") === expectDates.head)
      .groupBy("y", "x")
      .agg(expr("max_by(ndvi, time)").as("v"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for (y <- 0 until 32; x <- 0 until 32) {
      val got = frames.head.indices(y * 32 + x) & 0xff
      day.get((y, x)).flatten match {
        case Some(v) => assert(got == Raster.colorIndex(v, -0.2, 1.0),
          s"($y,$x): index $got for v=$v")
        case None => assert(got == 255, s"($y,$x): missing cell index $got != 255")
      }
    }
  }
}
