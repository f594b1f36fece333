package graft
// Temporary cross-validation helper (not part of the library surface):
// writes one frame per codec path for the independent Python parser.
object TiffDump {
  def main(args: Array[String]): Unit = {
    val g = ops.GridSpec(west = -50.0, north = 10.0,
      pxLon = 0.01, pxLat = -0.01, width = 40, height = 150)
    val vals = Array.tabulate(g.width * g.height)(i =>
      if (i % 11 == 0) ops.GeoTiff.Nodata else ((i * 31) % 997) / 997.0f)
    val bands = Seq("NDVI" -> vals, "EVI" -> vals.map(-_))
    def w(p: String, b: Array[Byte]) =
      java.nio.file.Files.write(java.nio.file.Paths.get(p), b)
    w("/tmp/t_deflate.tif", ops.GeoTiff.encode(g, "2024-06-01", bands))
    w("/tmp/t_none.tif", ops.GeoTiff.encode(g, "2024-06-01", bands, compress = false))
    w("/tmp/t_lzw.tif", ops.GeoTiff.encode(g, "2024-06-01", bands, lzw = true))
    println("wrote /tmp/t_{deflate,none,lzw}.tif")
  }
}

/** Companion dump for devtools/imgcheck.py: one PNG and one animated
  * GIF with deterministic payloads for the independent parser. */
object ImgDump {
  def main(args: Array[String]): Unit = {
    val (w, h) = (40, 25)
    val px = Array.tabulate(w * h)(i =>
      if (i % 13 == 0) 0
      else 0xff000000 | ops.Raster.RdYlGn((i * 7) % 255))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/t.png"),
      ops.Raster.Png.encode(w, h, px))
    val palette = ops.Raster.RdYlGn :+ 0xffffff
    val frames = (0 until 3).map(f =>
      ops.Raster.Gif.Frame(Array.tabulate(w * h)(i =>
        ((i * 3 + f * 11) % 256).toByte), 50))
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/t.gif"),
      ops.Raster.Gif.encode(w, h, palette, frames))
    println("wrote /tmp/t.png /tmp/t.gif")
  }
}
