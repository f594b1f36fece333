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
