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

  /** Even-odd reference over a ring SET: parity across all rings. */
  private def inRingsRef(lon: Double, lat: Double,
      rings: Seq[Seq[(Double, Double)]]): Boolean =
    rings.count(inRingRef(lon, lat, _)) % 2 == 1

  test("graft_in_rings: holes exclude, MultiPolygon members include, parity matches InRing") {
    // outer box (0..4, 0..4) with hole (1..2, 1..2), plus member (6..8, 0..1)
    val outer = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
    val hole = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))
    val member = Seq((6.0, 0.0), (8.0, 0.0), (8.0, 1.0), (6.0, 1.0), (6.0, 0.0))
    val rings = Seq(outer, hole, member)
    val pts = Seq(
      (0.5, 0.5, true),   // outer, not hole
      (1.5, 1.5, false),  // inside the hole -> excluded
      (3.5, 3.5, true),   // outer, past the hole
      (7.0, 0.5, true),   // second member
      (5.0, 0.5, false),  // between the members
      (9.0, 0.5, false))  // outside everything
    val ringsLit = rings.map(_.map { case (x, y) => Seq(x, y) })
    val got = pts.map { case (x, y, _) => ((x, y), ringsLit) }
      .toDF("pt", "rings")
      .selectExpr("pt._1 AS lon", "pt._2 AS lat",
        "graft_in_rings(pt._1, pt._2, rings) AS in_rings")
      .as[(Double, Double, Boolean)].collect().toSeq
    pts.zip(got).foreach { case ((lon, lat, want), (_, _, in)) =>
      assert(in == want, s"($lon, $lat): got $in, want $want")
      assert(in == inRingsRef(lon, lat, rings), s"($lon, $lat) diverges from reference")
    }
    // single-ring set degenerates to graft_in_ring exactly (concave case)
    val single = Seq((2.0, 0.5), (2.0, 1.5), (0.5, 1.5)).map { case (x, y) =>
      ((x, y), Seq(arrow.map { case (a, b) => Seq(a, b) }))
    }.toDF("pt", "rings")
      .selectExpr(
        "graft_in_rings(pt._1, pt._2, rings) AS multi",
        "graft_in_ring(pt._1, pt._2, rings[0]) AS one")
      .as[(Boolean, Boolean)].collect()
    single.foreach { case (m, o) => assert(m == o, "single-ring parity mismatch") }
  }

  test("graft_in_rings null semantics: empty set, bad ring in the set") {
    val good = Seq(Seq(Seq(0.0, 0.0), Seq(4.0, 0.0), Seq(4.0, 4.0), Seq(0.0, 4.0)))
    val empty = Seq((1.0, Seq.empty[Seq[Seq[Double]]])).toDF("lon", "rings")
      .selectExpr("graft_in_rings(lon, CAST(0.5 AS DOUBLE), rings) AS r")
      .as[Option[Boolean]].head()
    assert(empty.isEmpty)
    val badRing = Seq((1.0, good :+ Seq(Seq(0.0, 0.0), Seq(1.0, 1.0))))
      .toDF("lon", "rings")
      .selectExpr("graft_in_rings(lon, CAST(0.5 AS DOUBLE), rings) AS r")
      .as[Option[Boolean]].head()
    assert(badRing.isEmpty)
    val ok = Seq((1.0, good)).toDF("lon", "rings")
      .selectExpr("graft_in_rings(lon, CAST(0.5 AS DOUBLE), rings) AS r")
      .as[Option[Boolean]].head()
    assert(ok.contains(true))
  }

  test("holed MultiPolygon mask: hole cells excluded, members disjoint from hole") {
    val path = s"${Meta.AoiDir}/aoi_holed.geojson"
    // ring set loads as MultiPolygon: 3 rings (outer+hole of member 1,
    // outer of member 2)
    val rings = Meta.loadAoiRings(spark, path)
      .as[Seq[Seq[Seq[Double]]]].head()
      .map(_.map(p => (p(0), p(1))))
    assert(rings.length == 3, s"expected 3 rings, got ${rings.length}")
    val exact = Meta.aoiExactCellsMulti(spark, sf, path)
      .select("y", "x", "lon", "lat")
      .as[(Int, Int, Double, Double)].collect()
    assert(exact.nonEmpty, "multi mask kept nothing")
    // every kept cell passes the scalar even-odd reference over all rings
    exact.foreach { case (y, x, lon, lat) =>
      assert(inRingsRef(lon, lat, rings), s"cell ($y,$x) fails even-odd reference")
    }
    // the hole demonstrably excludes: at least one cell center lies inside
    // the hole ring, and no kept cell does
    val holeRing = rings(1)
    val g = ops.Resample.SrcGrid
    val holeCells = for {
      y <- 0 until g.height; x <- 0 until g.width
      lon = g.west + (x + 0.5) * g.pxLon
      lat = g.north + (y + 0.5) * g.pxLat
      if inRingRef(lon, lat, holeRing)
    } yield (y, x)
    assert(holeCells.nonEmpty, "fixture hole covers no cell center — weak fixture")
    val kept = exact.map(c => (c._1, c._2)).toSet
    holeCells.foreach(c => assert(!kept.contains(c), s"hole cell $c leaked into mask"))
    // and the outer-ring-only mask WOULD include them (the c07 gap)
    holeCells.foreach { case (y, x) =>
      val lon = g.west + (x + 0.5) * g.pxLon
      val lat = g.north + (y + 0.5) * g.pxLat
      assert(inRingRef(lon, lat, rings.head), s"hole cell ($y,$x) not in outer ring?")
    }
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
