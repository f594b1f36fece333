package graft

import org.apache.spark.sql.functions._
import graft.ops.Meta

/** Point-in-ring semantics (the exact AOI mask behind the c06 bbox
  * prefilter): the codegen'd graft_in_ring expression against a scalar
  * PNPOLY reference, null/degenerate handling, and the composed exact
  * mask as a strict refinement of the bounding box on testdata. */
class GeoSpec extends SparkSpecBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Scalar PNPOLY reference (same even-odd rule). */
  private def inRingRef(lon: Double, lat: Double, ring: Seq[(Double, Double)]): Boolean = {
    var in = false
    var j = ring.length - 1
    for (i <- ring.indices) {
      val (xi, yi) = ring(i); val (xj, yj) = ring(j)
      if ((yi > lat) != (yj > lat) &&
        lon < (xj - xi) * (lat - yi) / (yj - yi) + xi) in = !in
      j = i
    }
    in
  }

  // concave "arrow" polygon: the notch at (2, 1) is OUTSIDE
  private val arrow = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 1.0), (0.0, 2.0), (0.0, 0.0))

  test("graft_in_ring matches the PNPOLY reference on a concave polygon") {
    val pts = Seq(
      (1.0, 0.5), (3.0, 0.5), (2.0, 0.5),   // inside the body
      (2.0, 1.5),                           // inside the notch -> outside
      (0.5, 1.5), (3.5, 1.5),               // inside the wings
      (-1.0, 1.0), (5.0, 1.0), (2.0, 3.0))  // clearly outside
    val ringSeq = arrow.map { case (x, y) => Seq(x, y) }
    val got = pts.map { case (x, y) => ((x, y), Seq(ringSeq)) }
      .toDF("pt", "rings")
      .select(col("pt._1").as("lon"), col("pt._2").as("lat"),
        element_at(col("rings"), 1).as("ring"))
      .selectExpr("lon", "lat", "graft_in_ring(lon, lat, ring) AS in_ring")
      .as[(Double, Double, Boolean)].collect()
    got.foreach { case (lon, lat, in) =>
      assert(in == inRingRef(lon, lat, arrow),
        s"($lon, $lat): expression=$in reference=${inRingRef(lon, lat, arrow)}")
    }
    // the notch specifically: bbox says inside, the ring says outside
    assert(!got.find(p => p._1 == 2.0 && p._2 == 1.5).get._3)
  }

  test("graft_in_ring null semantics: null inputs, short ring, malformed vertex") {
    val ringSeq = arrow.map { case (x, y) => Seq(x, y) }
    val ok = Seq((Some(1.0), Seq(ringSeq))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(ok.contains(true))
    val nullLon = Seq((Option.empty[Double], Seq(ringSeq))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(nullLon.isEmpty)
    val shortRing = Seq((1.0, Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(shortRing.isEmpty)
    val malformed = Seq((1.0, Seq(Seq(Seq(0.0), Seq(1.0, 1.0), Seq(2.0, 0.0))))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(malformed.isEmpty)
    // malformed LAST vertex: read as the first iteration's predecessor,
    // so it must NULL out, not crash
    val malformedLast = Seq((1.0, Seq(Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0))))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(malformedLast.isEmpty)
    val nullLast = Seq((1.0, Seq(Seq(Some(Seq(0.0, 0.0)), Some(Seq(1.0, 1.0)),
      Some(Seq(2.0, 0.0)), Option.empty[Seq[Double]])))).toDF("lon", "rings")
      .selectExpr("graft_in_ring(lon, CAST(0.5 AS DOUBLE), rings[0]) AS r")
      .as[Option[Boolean]].head()
    assert(nullLast.isEmpty)
  }

  test("exact AOI mask refines the bbox prefilter on the clip fixture") {
    val exact = Meta.aoiExactCells(spark, sf, s"${Meta.AoiDir}/aoi_clip.geojson")
      .select("tile_id", "y", "x", "lon", "lat")
      .as[(Long, Int, Int, Double, Double)].collect()
    assert(exact.nonEmpty, "exact mask kept nothing")
    // every kept cell passes the scalar reference against the ring AS
    // LOADED from the fixture (one source of truth with aoiExactCells)
    val ring = Meta.loadAoiRing(spark, s"${Meta.AoiDir}/aoi_clip.geojson")
      .as[Seq[Seq[Double]]].head().map(p => (p(0), p(1)))
    exact.foreach { case (_, y, x, lon, lat) =>
      assert(inRingRef(lon, lat, ring), s"cell ($y,$x) at ($lon,$lat) outside ring")
    }
    // strict refinement: the polygon covers less than its bbox (91 cells
    // per tile at this grid, c06's declared count)
    val perTile = exact.groupBy(_._1).view.mapValues(_.length).toMap
    perTile.values.foreach(n => assert(n > 0 && n < 91, s"not a refinement: $perTile"))
  }
}
