package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Num.r6

/** Catalog/metadata scalar operators (SURVEY.md §2.1 filter_band_links,
  * §2.3 proj_extract_metadata; reference processor.py:105-109, 329-340).
  *
  * URL and GranuleUR strings are synthesized deterministically from the
  * testdata so the DuckDB oracle reproduces them bit-for-bit; the
  * filter/parse logic is exactly the reference's (band-substring link
  * filter, dot-split tile extraction, ISO-8601 round-trip, yyyyDDD cache
  * key).
  */
object Meta {

  type Q = (SparkSession, String) => DataFrame

  /** Band-link filter — processor.py:105-109: keep only asset URLs for
    * the four needed bands (here the B02/B04/B08 reflectance set). */
  val bandLinksQ: Q = (s, d) => {
    val p = Tables.part(s, d)
    p.select(
        col("p_partkey"),
        concat(lit("https://lpdaac.example/"), col("p_brand"), lit("/G"),
          col("p_partkey").cast("string"), lit(".B0"),
          (col("p_size") % 9).cast("string"), lit(".tif")).as("url"))
      .filter(col("url").rlike("\\.(B02|B04|B08)\\.tif$"))
      .withColumn("band", regexp_extract(col("url"), "(B0[0-9])\\.tif$", 1))
      .orderBy("p_partkey")
  }

  val bandLinksSql: String =
    """SELECT p_partkey, url, regexp_extract(url, '(B0[0-9])\.tif$', 1) AS band
      |FROM (
      |  SELECT p_partkey,
      |    'https://lpdaac.example/' || p_brand || '/G' || CAST(p_partkey AS VARCHAR)
      |      || '.B0' || CAST(p_size % 9 AS VARCHAR) || '.tif' AS url
      |  FROM part)
      |WHERE regexp_matches(url, '\.(B02|B04|B08)\.tif$')
      |ORDER BY p_partkey""".stripMargin

  /** GranuleUR/ISO metadata extraction — processor.py:329-340: tile id is
    * the 3rd dot-field of the UR; granule date parses from the ISO string;
    * cache key is strftime('%Y%j') (processor.py:343). */
  val extractMetadataQ: Q = (s, d) => {
    val px = Pixels.pixels(s, d)
    px.select("tile_id", "time").distinct()
      .withColumn("granule_ur",
        concat_ws(".", lit("HLS"), lit("S30"),
          concat(lit("T0"), col("tile_id").cast("string")),
          date_format(col("time"), "yyyyDDD'T'HHmmss"), lit("v2.0")))
      .withColumn("iso",
        date_format(col("time"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))
      .select(
        col("granule_ur"),
        split(col("granule_ur"), "\\.").getItem(2).as("tile_field"),
        unix_timestamp(to_timestamp(col("iso"), "yyyy-MM-dd'T'HH:mm:ss'Z'")).as("epoch_s"),
        date_format(col("time"), "yyyyDDD").as("cache_key"))
      .orderBy("granule_ur")
  }

  val extractMetadataSql: String = Pixels.withPixels(
    """SELECT granule_ur,
      |  split_part(granule_ur, '.', 3) AS tile_field,
      |  CAST(epoch(strptime(iso, '%Y-%m-%dT%H:%M:%SZ')) AS BIGINT) AS epoch_s,
      |  strftime(time, '%Y%j') AS cache_key
      |FROM (
      |  SELECT DISTINCT tile_id, time,
      |    concat_ws('.', 'HLS', 'S30', 'T0' || CAST(tile_id AS VARCHAR),
      |      strftime(time, '%Y%jT%H%M%S'), 'v2.0') AS granule_ur,
      |    strftime(time, '%Y-%m-%dT%H:%M:%SZ') AS iso
      |  FROM pixels)
      |ORDER BY granule_ur""".stripMargin)

  /** Band-set completeness gate — processor.py:111-116/128-143: a granule
    * is processed only if ALL four band files arrived; partial sets are
    * rejected. Granules and their asset bands are synthesized from part
    * rows; the gate is `count(DISTINCT needed band) = 4` per granule —
    * the keyed-aggregate + HAVING shape of the reference's check. */
  val bandCompletenessQ: Q = (s, d) => {
    val p = Tables.part(s, d)
    val links = p.select(
      (col("p_partkey") % 500).as("granule_id"),
      element_at(
        array(lit("B02"), lit("B04"), lit("B08"), lit("Fmask"), lit("B05"), lit("B07")),
        (col("p_size") % 6 + 1).cast("int")).as("band"))
    val needed = Seq("B02", "B04", "B08", "Fmask")
    links
      .groupBy("granule_id")
      .agg(
        count(lit(1)).as("n_links"),
        countDistinct(when(col("band").isin(needed: _*), col("band"))).as("n_needed"))
      .filter(col("n_needed") === 4)
      .orderBy("granule_id")
  }

  val bandCompletenessSql: String =
    """SELECT granule_id, count(*) AS n_links,
      |  count(DISTINCT CASE WHEN band IN ('B02','B04','B08','Fmask')
      |        THEN band END) AS n_needed
      |FROM (
      |  SELECT p_partkey % 500 AS granule_id,
      |    ['B02','B04','B08','Fmask','B05','B07'][CAST(p_size % 6 + 1 AS INT)] AS band
      |  FROM part)
      |GROUP BY granule_id
      |HAVING count(DISTINCT CASE WHEN band IN ('B02','B04','B08','Fmask')
      |       THEN band END) = 4
      |ORDER BY granule_id""".stripMargin

  /** Dataset index metadata — arcgis.py:103-153 (sink_index_json math):
    * one row with grid bounds, center point, dims, affine transform
    * coefficients, and the date span — computed relationally from the
    * pixel cube at 0.00027°/px west-anchored like the reference grid
    * (processor.py:184-196). A single global aggregate: partial combine
    * map-side, one tiny final row. */
  val indexMetaQ: Q = (s, d) => {
    val px = Pixels.pixels(s, d)
    val pxDeg = 0.00027
    px.agg(
        min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"),
        countDistinct("date").as("n_dates"),
        countDistinct("tile_id").as("n_tiles"))
      .select(
        (col("max_x") - col("min_x") + 1).as("width"),
        (col("max_y") - col("min_y") + 1).as("height"),
        col("n_dates"), col("n_tiles"),
        r6(col("min_x") * pxDeg).as("west"),
        r6((col("max_x") + 1) * lit(pxDeg)).as("east"),
        r6(col("min_y") * pxDeg).as("south"),
        r6((col("max_y") + 1) * lit(pxDeg)).as("north"),
        r6((col("min_x") + col("max_x") + 1) * lit(pxDeg) / 2.0).as("center_lon"),
        r6((col("min_y") + col("max_y") + 1) * lit(pxDeg) / 2.0).as("center_lat"),
        r6(lit(pxDeg)).as("t_a"),
        r6(lit(-pxDeg)).as("t_e"))
  }

  val indexMetaSql: String = Pixels.withPixels(
    """SELECT CAST(max(x) - min(x) + 1 AS INT) AS width,
      |  CAST(max(y) - min(y) + 1 AS INT) AS height,
      |  count(DISTINCT date) AS n_dates,
      |  count(DISTINCT tile_id) AS n_tiles,
      |  0.0 + round(min(x) * 0.00027, 6) AS west,
      |  0.0 + round((max(x) + 1) * 0.00027, 6) AS east,
      |  0.0 + round(min(y) * 0.00027, 6) AS south,
      |  0.0 + round((max(y) + 1) * 0.00027, 6) AS north,
      |  0.0 + round((min(x) + max(x) + 1) * 0.00027 / 2.0, 6) AS center_lon,
      |  0.0 + round((min(y) + max(y) + 1) * 0.00027 / 2.0, 6) AS center_lat,
      |  0.0 + round(0.00027, 6) AS t_a,
      |  0.0 + round(-0.00027, 6) AS t_e
      |FROM pixels""".stripMargin)

  /** Repo-local AOI fixtures for the GeoJSON ingest query (the study
    * areas a user draws on geojson.io per the reference README). */
  val AoiDir: String = sys.env.getOrElse("SPARK_GRAFT_AOI_DIR", "/root/repo/data")

  /** GeoJSON AOI ingest as data — pipeline.py:74-91 `load_aoi`: a
    * FeatureCollection contributes its first feature's geometry, a bare
    * Feature its `geometry` member, and anything else is taken as the
    * geometry itself — dispatched on the parsed document's CONTENT
    * (which members are present), exactly like the reference's dict
    * probing, not on a per-file inferred schema. One `wholetext` scan
    * reads every AOI document in a single pass with an explicit union
    * schema (no inference jobs), then the outer ring explodes to points
    * for the bounds/center math (`shape(...).bounds` + arcgis.py:107-109
    * midpoint). Documents parallelize per file at scale. */
  private def aoiDocs(s: SparkSession, paths: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    // Polygon coordinates are ring[] (3-deep); MultiPolygon coordinates
    // are polygon[] = ring[][] (4-deep). One JSON schema cannot carry
    // both depths, so the document parses twice and the geometry type
    // dispatches which parse supplies the ring set — from_json is
    // lenient, so the wrong-depth parse just yields NULL coordinates.
    val ring = ArrayType(ArrayType(ArrayType(DoubleType)))
    val ring4 = ArrayType(ring)
    val geom = StructType(Seq(
      StructField("type", StringType), StructField("coordinates", ring)))
    val geom4 = StructType(Seq(
      StructField("type", StringType), StructField("coordinates", ring4)))
    val doc = StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ring),
      StructField("geometry", geom),
      StructField("features", ArrayType(
        StructType(Seq(StructField("geometry", geom)))))))
    val doc4 = StructType(Seq(
      StructField("type", StringType),
      StructField("coordinates", ring4),
      StructField("geometry", geom4),
      StructField("features", ArrayType(
        StructType(Seq(StructField("geometry", geom4)))))))
    val g = coalesce(
      element_at(col("j.features"), 1).getField("geometry"),
      col("j.geometry"),
      struct(col("j.type").as("type"), col("j.coordinates").as("coordinates")))
    val g4 = coalesce(
      element_at(col("j4.features"), 1).getField("geometry"),
      col("j4.geometry"),
      struct(col("j4.type").as("type"), col("j4.coordinates").as("coordinates")))
    s.read.option("wholetext", value = true).text(paths: _*)
      .select(from_json(col("value"), doc).as("j"),
        from_json(col("value"), doc4).as("j4"))
      .select(
        when(col("j.features").isNotNull, "feature_collection")
          .when(col("j.geometry").isNotNull, "feature")
          .otherwise("bare_geometry").as("src_kind"),
        g.getField("type").as("geom_type"),
        g.getField("coordinates").as("coords"),
        g4.getField("coordinates").as("coords4"))
      // the full even-odd ring set: outer + holes for Polygon, all
      // members' rings for MultiPolygon
      .withColumn("rings",
        when(col("geom_type") === "MultiPolygon", flatten(col("coords4")))
          .otherwise(col("coords")))
  }

  private[graft] def loadAoi(s: SparkSession, paths: String*): DataFrame =
    aoiDocs(s, paths)
      .select(col("src_kind"), col("geom_type"),
        explode(element_at(col("coords"), 1)).as("pt"))

  /** The AOI's outer ring as one row (`array<[lon, lat]>`) — the shape
    * [[graft.functions.InRing]] consumes. */
  private[graft] def loadAoiRing(s: SparkSession, path: String): DataFrame =
    aoiDocs(s, Seq(path))
      .select(element_at(col("coords"), 1).as("ring"))

  /** The AOI's FULL ring set as one row (`array<ring>`): outer + holes
    * for a Polygon, every member's rings for a MultiPolygon — the shape
    * [[graft.functions.InRings]] consumes. */
  private[graft] def loadAoiRings(s: SparkSession, path: String): DataFrame =
    aoiDocs(s, Seq(path)).select(col("rings"))

  /** Exact AOI mask over the georeferenced pixel grid: the c06 bbox
    * prefilter composed with the codegen'd ray-casting in-ring test —
    * the reference's rasterized-polygon mask (shapely `contains`). The
    * one-row ring broadcasts; the grid side is scanned once and both
    * predicates evaluate in the same codegen stage, so refining costs
    * one comparison chain per surviving candidate, not a second pass. */
  def aoiExactCells(s: SparkSession, d: String, path: String): DataFrame = {
    val g = Resample.SrcGrid
    val ring = loadAoiRing(s, path)
      .select(col("ring"),
        expr("array_min(transform(ring, p -> p[0]))").as("bw"),
        expr("array_min(transform(ring, p -> p[1]))").as("bs"),
        expr("array_max(transform(ring, p -> p[0]))").as("be"),
        expr("array_max(transform(ring, p -> p[1]))").as("bn"))
    Pixels.pixels(s, d).select("tile_id", "y", "x").distinct()
      .withColumn("lon", lit(g.west) + (col("x") + 0.5) * g.pxLon)
      .withColumn("lat", lit(g.north) + (col("y") + 0.5) * g.pxLat)
      .crossJoin(broadcast(ring))
      .filter(col("lon") >= col("bw") && col("lon") <= col("be") &&
        col("lat") >= col("bs") && col("lat") <= col("bn"))
      .filter(expr("graft_in_ring(lon, lat, ring)"))
      .select("tile_id", "y", "x", "lon", "lat")
  }

  val geojsonAoiQ: Q = (s, _) => {
    val pts = loadAoi(s, s"$AoiDir/aoi_fc.geojson",
      s"$AoiDir/aoi_feature.geojson", s"$AoiDir/aoi_geom.geojson")
    pts.groupBy("src_kind", "geom_type")
      .agg(
        count(lit(1)).as("n_points"),
        min(element_at(col("pt"), 1)).as("wmin"),
        min(element_at(col("pt"), 2)).as("smin"),
        max(element_at(col("pt"), 1)).as("emax"),
        max(element_at(col("pt"), 2)).as("nmax"))
      .select(col("src_kind"), col("geom_type"), col("n_points"),
        r6(col("wmin")).as("west"), r6(col("smin")).as("south"),
        r6(col("emax")).as("east"), r6(col("nmax")).as("north"),
        r6((col("wmin") + col("emax")) / 2.0).as("center_lon"),
        r6((col("smin") + col("nmax")) / 2.0).as("center_lat"))
      .orderBy("src_kind")
  }

  val geojsonAoiSql: String =
    s"""WITH fc AS (
       |  SELECT 'feature_collection' AS src_kind,
       |    features[1].geometry.type AS geom_type,
       |    unnest(features[1].geometry.coordinates[1]) AS pt
       |  FROM read_json('$AoiDir/aoi_fc.geojson')
       |), ft AS (
       |  SELECT 'feature' AS src_kind, geometry.type AS geom_type,
       |    unnest(geometry.coordinates[1]) AS pt
       |  FROM read_json('$AoiDir/aoi_feature.geojson')
       |), bg AS (
       |  SELECT 'bare_geometry' AS src_kind, type AS geom_type,
       |    unnest(coordinates[1]) AS pt
       |  FROM read_json('$AoiDir/aoi_geom.geojson')
       |), pts AS (
       |  SELECT * FROM fc UNION ALL SELECT * FROM ft UNION ALL SELECT * FROM bg
       |)
       |SELECT src_kind, geom_type, count(*) AS n_points,
       |  0.0 + round(min(pt[1]), 6) AS west,
       |  0.0 + round(min(pt[2]), 6) AS south,
       |  0.0 + round(max(pt[1]), 6) AS east,
       |  0.0 + round(max(pt[2]), 6) AS north,
       |  0.0 + round((min(pt[1]) + max(pt[1])) / 2.0, 6) AS center_lon,
       |  0.0 + round((min(pt[2]) + max(pt[2])) / 2.0, 6) AS center_lat
       |FROM pts
       |GROUP BY src_kind, geom_type
       |ORDER BY src_kind""".stripMargin

  /** AOI bounding-box clip of the pixel grid — the reference drives both
    * its catalog search bbox (searcher.py) and its grid subset from the
    * loaded AOI polygon; the SQL-expressible core is the bounds test
    * against cell centers georeferenced by the fixed 0.00027°/px grid
    * (processor.py:184-196). The single-row AOI bounds broadcast to the
    * grid scan — AOI is config-sized at any corpus scale, so the big
    * side never shuffles. (The reference's exact rasterized-polygon mask
    * is the in-ring refinement of these candidates; the bbox is the
    * pushdown-friendly prefilter both systems share.) */
  val aoiClipQ: Q = (s, d) => {
    val g = Resample.SrcGrid
    val box = loadAoi(s, s"$AoiDir/aoi_clip.geojson")
      .agg(
        min(element_at(col("pt"), 1)).as("bw"),
        min(element_at(col("pt"), 2)).as("bs"),
        max(element_at(col("pt"), 1)).as("be"),
        max(element_at(col("pt"), 2)).as("bn"))
    Pixels.pixels(s, d).select("tile_id", "y", "x").distinct()
      .withColumn("lon", lit(g.west) + (col("x") + 0.5) * g.pxLon)
      .withColumn("lat", lit(g.north) + (col("y") + 0.5) * g.pxLat)
      .crossJoin(broadcast(box))
      .groupBy("tile_id")
      .agg(
        sum(when(col("lon") >= col("bw") && col("lon") <= col("be") &&
          col("lat") >= col("bs") && col("lat") <= col("bn"), 1L)
          .otherwise(0L)).as("n_in"),
        count(lit(1)).as("n_cells"))
      .orderBy("tile_id")
  }

  val aoiClipSql: String = {
    val g = Resample.SrcGrid
    Pixels.withPixels(
      s"""WITH box AS (
         |  SELECT min(pt[1]) AS bw, min(pt[2]) AS bs,
         |         max(pt[1]) AS be, max(pt[2]) AS bn
         |  FROM (SELECT unnest(features[1].geometry.coordinates[1]) AS pt
         |        FROM read_json('$AoiDir/aoi_clip.geojson'))
         |), cells AS (
         |  SELECT DISTINCT tile_id, y, x FROM pixels
         |), geo AS (
         |  SELECT tile_id,
         |    ${g.west} + ((x + 0.5) * ${g.pxLon}) AS lon,
         |    ${g.north} + ((y + 0.5) * ${g.pxLat}) AS lat
         |  FROM cells
         |)
         |SELECT tile_id,
         |  CAST(sum(CASE WHEN lon >= bw AND lon <= be
         |        AND lat >= bs AND lat <= bn THEN 1 ELSE 0 END) AS BIGINT) AS n_in,
         |  count(*) AS n_cells
         |FROM geo CROSS JOIN box
         |GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  /** Declared form of the exact mask: per-tile cell count and bounds of
    * the in-polygon grid cells from [[aoiExactCells]] — the codegen'd
    * graft_in_ring against a DuckDB oracle that spells the same even-odd
    * edge-crossing parity relationally (sum of crossings per cell, mod
    * 2). Both engines evaluate the identical IEEE-double crossing
    * predicate, so the cell set is bit-identical; cells outside the
    * bbox prefilter are outside the ring by construction, so the
    * prefilter never changes the declared result. */
  val aoiExactQ: Q = (s, d) => {
    aoiExactCells(s, d, s"$AoiDir/aoi_clip.geojson")
      .groupBy("tile_id")
      .agg(count(lit(1)).as("n_exact"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("x").as("x_min"), max("x").as("x_max"))
      .orderBy("tile_id")
  }

  val aoiExactSql: String = {
    val g = Resample.SrcGrid
    Pixels.withPixels(
      s"""WITH ringarr AS (
         |  SELECT features[1].geometry.coordinates[1] AS ring
         |  FROM read_json('$AoiDir/aoi_clip.geojson')
         |), edges AS (
         |  SELECT ring[i.i][1] AS xi, ring[i.i][2] AS yi,
         |         ring[i.i + 1][1] AS xj, ring[i.i + 1][2] AS yj
         |  FROM ringarr,
         |  LATERAL (SELECT unnest(generate_series(1, len(ring) - 1)) AS i) i
         |), cells AS (
         |  SELECT DISTINCT tile_id, y, x FROM pixels
         |), geo AS (
         |  SELECT tile_id, y, x,
         |    ${g.west} + ((x + 0.5) * ${g.pxLon}) AS lon,
         |    ${g.north} + ((y + 0.5) * ${g.pxLat}) AS lat
         |  FROM cells
         |), inside AS (
         |  SELECT tile_id, y, x
         |  FROM geo CROSS JOIN edges
         |  GROUP BY tile_id, y, x, lon, lat
         |  HAVING sum(CASE WHEN (yi > lat) <> (yj > lat)
         |      AND lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
         |    THEN 1 ELSE 0 END) % 2 = 1
         |)
         |SELECT tile_id, count(*) AS n_exact,
         |  min(y) AS y_min, max(y) AS y_max,
         |  min(x) AS x_min, max(x) AS x_max
         |FROM inside
         |GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  /** Exact AOI mask honoring interior rings (holes) and MultiPolygon
    * members — shapely's semantics for the geometries `shape(aoi)`
    * accepts (pipeline.py:78-84), which the single-ring c07 mask cannot
    * express: a cell inside an excluded lake/urban hole must NOT
    * select. Same shape as [[aoiExactCells]]: bbox prefilter over the
    * all-ring bounds (holes lie inside their outer ring, so the
    * flattened bounds equal the outer bounds), then one codegen'd
    * even-odd parity pass over the FULL broadcast ring set. */
  def aoiExactCellsMulti(s: SparkSession, d: String, path: String): DataFrame = {
    val g = Resample.SrcGrid
    val rings = loadAoiRings(s, path)
      .select(col("rings"),
        expr("array_min(transform(flatten(rings), p -> p[0]))").as("bw"),
        expr("array_min(transform(flatten(rings), p -> p[1]))").as("bs"),
        expr("array_max(transform(flatten(rings), p -> p[0]))").as("be"),
        expr("array_max(transform(flatten(rings), p -> p[1]))").as("bn"))
    Pixels.pixels(s, d).select("tile_id", "y", "x").distinct()
      .withColumn("lon", lit(g.west) + (col("x") + 0.5) * g.pxLon)
      .withColumn("lat", lit(g.north) + (col("y") + 0.5) * g.pxLat)
      .crossJoin(broadcast(rings))
      .filter(col("lon") >= col("bw") && col("lon") <= col("be") &&
        col("lat") >= col("bs") && col("lat") <= col("bn"))
      .filter(expr("graft_in_rings(lon, lat, rings)"))
      .select("tile_id", "y", "x", "lon", "lat")
  }

  /** Declared form over the holed-MultiPolygon fixture: per-tile count
    * and bounds of in-mask cells. Oracle = the same even-odd crossing
    * parity summed over ALL rings of ALL members (identical IEEE-double
    * predicate), so hole exclusion is bit-checked. */
  val aoiHoledQ: Q = (s, d) => {
    aoiExactCellsMulti(s, d, s"$AoiDir/aoi_holed.geojson")
      .groupBy("tile_id")
      .agg(count(lit(1)).as("n_exact"),
        min("y").as("y_min"), max("y").as("y_max"),
        min("x").as("x_min"), max("x").as("x_max"))
      .orderBy("tile_id")
  }

  val aoiHoledSql: String = {
    val g = Resample.SrcGrid
    Pixels.withPixels(
      s"""WITH polys AS (
         |  SELECT unnest(geometry.coordinates) AS poly
         |  FROM read_json('$AoiDir/aoi_holed.geojson')
         |), rings AS (
         |  SELECT unnest(poly) AS ring FROM polys
         |), edges AS (
         |  SELECT ring[i.i][1] AS xi, ring[i.i][2] AS yi,
         |         ring[i.i + 1][1] AS xj, ring[i.i + 1][2] AS yj
         |  FROM rings,
         |  LATERAL (SELECT unnest(generate_series(1, len(ring) - 1)) AS i) i
         |), cells AS (
         |  SELECT DISTINCT tile_id, y, x FROM pixels
         |), geo AS (
         |  SELECT tile_id, y, x,
         |    ${g.west} + ((x + 0.5) * ${g.pxLon}) AS lon,
         |    ${g.north} + ((y + 0.5) * ${g.pxLat}) AS lat
         |  FROM cells
         |), inside AS (
         |  SELECT tile_id, y, x
         |  FROM geo CROSS JOIN edges
         |  GROUP BY tile_id, y, x, lon, lat
         |  HAVING sum(CASE WHEN (yi > lat) <> (yj > lat)
         |      AND lon < (xj - xi) * (lat - yi) / (yj - yi) + xi
         |    THEN 1 ELSE 0 END) % 2 = 1
         |)
         |SELECT tile_id, count(*) AS n_exact,
         |  min(y) AS y_min, max(y) AS y_max,
         |  min(x) AS x_min, max(x) AS x_max
         |FROM inside
         |GROUP BY tile_id
         |ORDER BY tile_id""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "c08_aoi_holed" -> aoiHoledQ,
    "c01_band_links" -> bandLinksQ,
    "c02_extract_metadata" -> extractMetadataQ,
    "c03_band_completeness" -> bandCompletenessQ,
    "c04_index_meta" -> indexMetaQ,
    "c05_geojson_aoi" -> geojsonAoiQ,
    "c06_aoi_clip" -> aoiClipQ,
    "c07_aoi_exact" -> aoiExactQ)

  val oracle: Map[String, String] = Map(
    "c08_aoi_holed" -> aoiHoledSql,
    "c01_band_links" -> bandLinksSql,
    "c02_extract_metadata" -> extractMetadataSql,
    "c03_band_completeness" -> bandCompletenessSql,
    "c04_index_meta" -> indexMetaSql,
    "c05_geojson_aoi" -> geojsonAoiSql,
    "c06_aoi_clip" -> aoiClipSql,
    "c07_aoi_exact" -> aoiExactSql)
}
