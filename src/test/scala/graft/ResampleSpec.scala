package graft

import graft.ops.Resample

/** Resampling semantics: the dense kernel (option a) and the relational
  * explode-and-aggregate form (option b) agree; NULL cells renormalize
  * the remaining weight (SURVEY.md §2.4, §7.4 #8). */
class ResampleSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("kernel and relational bilinear agree on the real source grid") {
    val srcRows = Resample.sourceGrid(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val dense = Array.tabulate(Resample.SrcSize, Resample.SrcSize)(
      (y, x) => srcRows.getOrElse((y, x), None))
    val kernel = Resample.bilinearKernel(dense, Resample.DstSize)
    val rel = Resample.bilinearRelational(spark, sf)
      .select("ty", "tx", "ndvi").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for (ty <- 0 until Resample.DstSize; tx <- 0 until Resample.DstSize) {
      (kernel(ty)(tx), rel((ty, tx))) match {
        case (Some(k), Some(q)) =>
          assert(math.abs(k - q) < 1e-5, s"($ty,$tx): kernel=$k relational=$q")
        case (None, None) => ()
        case other => fail(s"($ty,$tx): null mismatch $other")
      }
    }
  }

  test("affine kernel and relational affine warp agree on the real source grid") {
    val srcRows = Resample.sourceGrid(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val dense = Array.tabulate(Resample.SrcSize, Resample.SrcSize)(
      (y, x) => srcRows.getOrElse((y, x), None))
    val kernel = Resample.affineKernel(dense, Resample.SrcGrid, Resample.DstGrid)
    val rel = Resample.bilinearAffine(spark, sf)
      .select("ty", "tx", "lon", "lat", "ndvi").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    for (ty <- 0 until Resample.DstSize; tx <- 0 until Resample.DstSize) {
      val (lon, lat, v) = rel((ty, tx))
      // georeferencing: cell centers land strictly inside the target bounds
      assert(lon > Resample.DstGrid.west && lon < Resample.DstGrid.east,
        s"($ty,$tx): lon $lon outside grid")
      assert(lat < Resample.DstGrid.north && lat > Resample.DstGrid.south,
        s"($ty,$tx): lat $lat outside grid")
      (kernel(ty)(tx), v) match {
        case (Some(k), Some(q)) =>
          assert(math.abs(k - q) < 1e-5, s"($ty,$tx): kernel=$k relational=$q")
        case (None, None) => ()
        case other => fail(s"($ty,$tx): null mismatch $other")
      }
    }
  }

  test("Transverse-Mercator math: CM anchor, round-trip, arc vs numeric integral") {
    import graft.ops.Utm
    // on the central meridian the easting is exactly the false easting
    // and northing is k0 times the meridian arc
    val (e0, n0) = Utm.forward(50.0, 9.0, 32)
    assert(math.abs(e0 - 500000.0) < 1e-6, s"CM easting $e0")
    assert(math.abs(n0 - Utm.K0 * Utm.meridianArc(math.toRadians(50))) < 1e-6)
    // the series meridian arc must match an independent numeric
    // integration of the arc integrand a(1-e²)(1-e²sin²t)^(-3/2)
    val phi = math.toRadians(50)
    val steps = 200000
    val h = phi / steps
    var arc = 0.0
    for (i <- 0 until steps) {
      def f(t: Double) = {
        val s2 = math.sin(t) * math.sin(t)
        Utm.SemiMajor * (1 - Utm.E2) * math.pow(1 - Utm.E2 * s2, -1.5)
      }
      val t0 = i * h
      arc += h / 6 * (f(t0) + 4 * f(t0 + h / 2) + f(t0 + h))
    }
    // the e⁶-truncated series carries ~0.4 mm truncation error at 50°
    // against the exact integral — bound it at a millimeter
    assert(math.abs(arc - Utm.meridianArc(phi)) < 1e-3,
      s"series ${Utm.meridianArc(phi)} vs integral $arc")
    // forward∘inverse round-trips to ~1e-8° (≈1 mm — the forward and
    // inverse series truncations do not cancel exactly)
    for (lat <- Seq(49.99, 50.0); lon <- Seq(10.0, 10.005, 10.009)) {
      val (e, n) = Utm.forward(lat, lon, 32)
      val (lat2, lon2) = Utm.inverse(e, n, 32)
      assert(math.abs(lat2 - lat) < 1e-8 && math.abs(lon2 - lon) < 1e-8,
        s"round-trip ($lat,$lon) -> ($lat2,$lon2)")
    }
    // anisotropy at 50°N: a degree of longitude is ~cos(50°) of a
    // degree of latitude in meters — the distortion an affine cannot
    // express and the TM warp must
    val (eA, _) = Utm.forward(50.0, 10.0, 32)
    val (eB, _) = Utm.forward(50.0, 10.001, 32)
    val (_, nA) = Utm.forward(50.0, 10.0, 32)
    val (_, nB) = Utm.forward(50.001, 10.0, 32)
    val ratio = (eB - eA) / (nB - nA)
    assert(math.abs(ratio - math.cos(math.toRadians(50))) < 0.01,
      s"lon/lat meter ratio $ratio")
  }

  test("UTM kernel and relational UTM warp agree on the real source grid") {
    val srcRows = Resample.sourceGrid(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val dense = Array.tabulate(Resample.SrcSize, Resample.SrcSize)(
      (y, x) => srcRows.getOrElse((y, x), None))
    val kernel = Resample.utmKernel(dense, Resample.utmEast0,
      Resample.utmNorth0, Resample.UtmPx, Resample.UtmZone, Resample.DstGrid)
    val rel = Resample.bilinearUtm(spark, sf)
      .select("ty", "tx", "easting", "northing", "ndvi").collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    for (ty <- 0 until Resample.DstSize; tx <- 0 until Resample.DstSize) {
      val (e, n, v) = rel((ty, tx))
      // projected centers land inside the UTM source raster
      assert(e > Resample.utmEast0 &&
        e < Resample.utmEast0 + Resample.SrcSize * Resample.UtmPx,
        s"($ty,$tx): easting $e outside source")
      assert(n < Resample.utmNorth0 &&
        n > Resample.utmNorth0 - Resample.SrcSize * Resample.UtmPx,
        s"($ty,$tx): northing $n outside source")
      (kernel(ty)(tx), v) match {
        case (Some(k), Some(q)) =>
          assert(math.abs(k - q) < 1e-5, s"($ty,$tx): kernel=$k relational=$q")
        case (None, None) => ()
        case other => fail(s"($ty,$tx): null mismatch $other")
      }
    }
    // the warp is genuinely non-affine: column spacing in source pixels
    // differs from row spacing (the ~cos(50°) anisotropy)
    val t = Resample.utmTargets.toIndexedSeq
    val dSx = t(1)._6 - t(0)._6                 // one tx step
    val dSy = t(Resample.DstSize)._5 - t(0)._5  // one ty step
    assert(dSx / dSy < 0.75, s"sx step $dSx vs sy step $dSy not anisotropic")
  }

  test("UTM kernel is shape-correct on a non-square raster") {
    // half-width source: the x neighbor must clamp against the ROW width
    // (16), not the row count (32) — targets east of the narrow raster
    // would otherwise index past the row
    val h = Resample.SrcSize
    val w = Resample.SrcSize / 2
    val dense: Array[Array[Option[Double]]] =
      Array.tabulate(h, w)((y, x) => Some(y * 0.001 + x * 0.01))
    val out = Resample.utmKernel(dense, Resample.utmEast0,
      Resample.utmNorth0, Resample.UtmPx, Resample.UtmZone, Resample.DstGrid)
    assert(out.length == Resample.DstGrid.height &&
      out.head.length == Resample.DstGrid.width)
    val vals = out.flatten.flatten
    assert(vals.nonEmpty, "kernel produced no values on the narrow raster")
    val mx = (h - 1) * 0.001 + (w - 1) * 0.01
    assert(vals.forall(v => v >= 0.0 && v <= mx + 1e-9),
      "kernel sampled a value no cell of the narrow raster holds")
  }

  test("affine fromBounds round-trips bounds into per-pixel degrees") {
    val g = graft.ops.GridSpec.fromBounds(10.0, 49.0, 11.0, 50.0, 100, 50)
    assert(math.abs(g.pxLon - 0.01) < 1e-12)
    assert(math.abs(g.pxLat + 0.02) < 1e-12)
    assert(math.abs(g.east - 11.0) < 1e-12)
    assert(math.abs(g.south - 49.0) < 1e-12)
  }

  test("kernel renormalizes around missing cells instead of nulling the output") {
    val src = Array.tabulate(4, 4)((y, x) =>
      if (y == 1 && x == 1) None else Some(1.0))
    val out = Resample.bilinearKernel(src, 2)
    // every target still gets a value (neighbors exist), and constant
    // field resamples to the constant
    out.flatten.foreach(v => assert(v.contains(1.0)))
  }

  test("all-null source yields all-null target") {
    val src = Array.fill(4, 4)(Option.empty[Double])
    val out = Resample.bilinearKernel(src, 2)
    assert(out.flatten.forall(_.isEmpty))
  }

  test("identity-size resample of a constant grid is the constant") {
    val src = Array.fill(8, 8)(Option(0.5))
    val out = Resample.bilinearKernel(src, 8)
    out.flatten.foreach(v => assert(v.exists(x => math.abs(x - 0.5) < 1e-12)))
  }
}
