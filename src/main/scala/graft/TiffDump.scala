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
