package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Num._

/** Reprojection / resampling (SURVEY.md §2.4; reference
  * processor.py:205-251): warp a source grid to a target grid with
  * bilinear (reflectance) or nearest (categorical) sampling.
  *
  * Two implementations with identical semantics:
  *  - [[bilinearRelational]]: pure DataFrame ops — each target cell
  *    explodes to its ≤4 covering source cells with bilinear weights,
  *    then a keyed aggregate divides the weighted sums. Shuffle-scalable
  *    (partitions by target key), DuckDB-oracle-checkable, and the form
  *    that survives 100 TB (option (b) in SURVEY §2.4).
  *  - [[bilinearKernel]]: per-tile mapPartitions warp over a dense
  *    in-memory band — the rasterio-like form (option (a)), used when a
  *    tile fits an executor core; ResampleSpec asserts both agree.
  *
  * NULL handling mirrors the NaN discipline: masked source cells drop
  * out of the weighted sum (renormalizing by the remaining weight),
  * like numpy nan-aware resampling.
  */
/** North-up affine georeferencing of a raster grid — the `from_bounds`
  * transform the reference builds for its target grid (processor.py:
  * 184-196): a cell center (y, x) sits at
  * `lon = west + (x + 0.5) * pxLon`, `lat = north + (y + 0.5) * pxLat`
  * (pxLat negative, north-up), and the inverse affine maps a lon/lat to
  * fractional pixel coordinates for sampling. Plain data — it enters the
  * plan as literal expressions (closure-serialized to executors), never
  * as a lookup join. */
final case class GridSpec(west: Double, north: Double,
    pxLon: Double, pxLat: Double, width: Int, height: Int) {
  def east: Double = west + width * pxLon
  def south: Double = north + height * pxLat

  /** Stride-`k` downsample: same anchor, k× coarser pixels, 1/k dims —
    * the affine rescale a downsampled export must carry
    * (arcgis.py:47-48 `transform * Affine.scale(downsample)`). */
  def downsample(k: Int): GridSpec = {
    require(k >= 1 && width % k == 0 && height % k == 0,
      s"stride $k does not tile ${width}x$height")
    copy(pxLon = pxLon * k, pxLat = pxLat * k,
      width = width / k, height = height / k)
  }
}

object GridSpec {
  /** rasterio-style `from_bounds`: degrees-per-pixel derived from the
    * bounds and the raster size (processor.py:190-196). */
  def fromBounds(west: Double, south: Double, east: Double, north: Double,
      width: Int, height: Int): GridSpec =
    GridSpec(west, north, (east - west) / width, (south - north) / height,
      width, height)
}

object Resample {

  type Q = (SparkSession, String) => DataFrame

  val SrcSize = 32
  val DstSize = 20
  /** scale = 32/20; target cell centers map to source coords
    * sy = (ty + 0.5) * scale - 0.5. */
  val Scale: Double = SrcSize.toDouble / DstSize

  /** Reference-like georeferencing: 0.00027°/px (processor.py:189), the
    * 32×32 source anchored at (10°E, 50°N) north-up. */
  val PxDeg = 0.00027
  val SrcGrid: GridSpec = GridSpec.fromBounds(
    west = 10.0, south = 50.0 - SrcSize * PxDeg,
    east = 10.0 + SrcSize * PxDeg, north = 50.0,
    width = SrcSize, height = SrcSize)
  /** Target: a 20×20 grid over the interior subwindow covering source
    * cells 4..28 — a real warp (offset + 1.2× rescale), not the g01
    * origin-aligned special case. */
  val DstGrid: GridSpec = GridSpec.fromBounds(
    west = SrcGrid.west + 4 * PxDeg, south = SrcGrid.north - 28 * PxDeg,
    east = SrcGrid.west + 28 * PxDeg, north = SrcGrid.north - 4 * PxDeg,
    width = DstSize, height = DstSize)

  /** Source grid: per-(y,x) temporal mean of clipped NDVI (deterministic
    * over the pixel relation). */
  def sourceGrid(s: SparkSession, d: String): DataFrame =
    PixelOps.withIndices(Pixels.pixels(s, d))
      .groupBy("y", "x")
      .agg(avg("ndvi_c").as("v"))

  private val sourceGridSql: String = {
    val f = Pixels.Sql0
    s"""SELECT y, x, avg(${f.ndviClipped}) AS v
       |FROM pixels GROUP BY y, x""".stripMargin
  }

  /** Relational bilinear resample of the 32×32 NDVI mean grid to 20×20. */
  val bilinearRelational: Q = (s, d) => {
    val src = sourceGrid(s, d)
    val ty = s.range(DstSize).select(col("id").cast("int").as("ty"))
    val tx = s.range(DstSize).select(col("id").cast("int").as("tx"))
    val corners = Seq((0, 0), (0, 1), (1, 0), (1, 1))
      .toDF(s)("dy", "dx")
    val targets = ty.crossJoin(tx).crossJoin(corners)
      .withColumn("sy", (col("ty") + 0.5) * Scale - 0.5)
      .withColumn("sx", (col("tx") + 0.5) * Scale - 0.5)
      .withColumn("fy", col("sy") - floor(col("sy")))
      .withColumn("fx", col("sx") - floor(col("sx")))
      .withColumn("ny", least(greatest(floor(col("sy")).cast("int") + col("dy"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(floor(col("sx")).cast("int") + col("dx"), lit(0)), lit(SrcSize - 1)))
      .withColumn("w",
        (when(col("dy") === 0, lit(1.0) - col("fy")).otherwise(col("fy"))) *
          (when(col("dx") === 0, lit(1.0) - col("fx")).otherwise(col("fx"))))
    targets.join(src, col("ny") === col("y") && col("nx") === col("x"), "left")
      .groupBy("ty", "tx")
      .agg(
        r6(sum(when(col("v").isNotNull, col("w") * col("v"))) /
          sum(when(col("v").isNotNull, col("w")))).as("ndvi"),
        r6(sum(when(col("v").isNotNull, col("w")))).as("w_valid"))
      .orderBy("ty", "tx")
  }

  implicit private class SeqToDF(private val pairs: Seq[(Int, Int)]) extends AnyVal {
    def toDF(s: SparkSession)(c1: String, c2: String): DataFrame = {
      val rows = pairs.map { case (a, b) => Row(a, b) }
      s.createDataFrame(s.sparkContext.parallelize(rows, 1),
        StructType(Seq(StructField(c1, IntegerType, false), StructField(c2, IntegerType, false))))
    }
  }

  val bilinearRelationalSql: String = Pixels.withPixels(
    s"""WITH src AS (
       |$sourceGridSql
       |), corners AS (
       |  SELECT * FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS t(dy, dx)
       |), targets AS (
       |  SELECT ty.g AS ty, tx.g AS tx, dy, dx,
       |    (ty.g + 0.5) * $Scale - 0.5 AS sy,
       |    (tx.g + 0.5) * $Scale - 0.5 AS sx
       |  FROM (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) ty,
       |       (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) tx,
       |       corners
       |), weighted AS (
       |  SELECT ty, tx,
       |    least(greatest(CAST(floor(sy) AS INT) + dy, 0), ${SrcSize - 1}) AS ny,
       |    least(greatest(CAST(floor(sx) AS INT) + dx, 0), ${SrcSize - 1}) AS nx,
       |    (CASE WHEN dy = 0 THEN 1.0 - (sy - floor(sy)) ELSE sy - floor(sy) END)
       |    * (CASE WHEN dx = 0 THEN 1.0 - (sx - floor(sx)) ELSE sx - floor(sx) END) AS w
       |  FROM targets
       |)
       |SELECT ty, tx,
       |  0.0 + round(sum(CASE WHEN v IS NOT NULL THEN w * v END)
       |        / sum(CASE WHEN v IS NOT NULL THEN w END), 6) AS ndvi,
       |  0.0 + round(sum(CASE WHEN v IS NOT NULL THEN w END), 6) AS w_valid
       |FROM weighted LEFT JOIN src ON ny = src.y AND nx = src.x
       |GROUP BY ty, tx
       |ORDER BY ty, tx""".stripMargin)

  /** Affine-georeferenced bilinear warp (g03; processor.py:205-239):
    * each target cell center goes through the [[DstGrid]] affine to a
    * real lon/lat, the inverse [[SrcGrid]] affine maps that to
    * fractional source pixels, and the same renormalizing bilinear
    * kernel as g01 samples the ≤4 covering cells. Unlike g01's
    * origin-aligned fixed grid, the mapping here has an origin offset
    * and a 1.2× rescale driven entirely by the two GridSpecs — swap in
    * any `from_bounds` target and the plan is unchanged. Weighted sums
    * accumulate in DECIMAL(38,18) so the hash compare is
    * order-independent. */
  val bilinearAffine: Q = (s, d) => {
    val src = sourceGrid(s, d)
    val ty = s.range(DstSize).select(col("id").cast("int").as("ty"))
    val tx = s.range(DstSize).select(col("id").cast("int").as("tx"))
    val corners = Seq((0, 0), (0, 1), (1, 0), (1, 1))
      .toDF(s)("dy", "dx")
    val targets = ty.crossJoin(tx).crossJoin(corners)
      .withColumn("lon", lit(DstGrid.west) + (col("tx") + 0.5) * DstGrid.pxLon)
      .withColumn("lat", lit(DstGrid.north) + (col("ty") + 0.5) * DstGrid.pxLat)
      .withColumn("sx", (col("lon") - SrcGrid.west) / SrcGrid.pxLon - 0.5)
      .withColumn("sy", (col("lat") - SrcGrid.north) / SrcGrid.pxLat - 0.5)
      .withColumn("fy", col("sy") - floor(col("sy")))
      .withColumn("fx", col("sx") - floor(col("sx")))
      .withColumn("ny", least(greatest(floor(col("sy")).cast("int") + col("dy"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(floor(col("sx")).cast("int") + col("dx"), lit(0)), lit(SrcSize - 1)))
      .withColumn("w",
        (when(col("dy") === 0, lit(1.0) - col("fy")).otherwise(col("fy"))) *
          (when(col("dx") === 0, lit(1.0) - col("fx")).otherwise(col("fx"))))
    targets.join(src, col("ny") === col("y") && col("nx") === col("x"), "left")
      .groupBy("ty", "tx")
      .agg(
        r6(xsumHi(when(col("v").isNotNull, col("w") * col("v"))) /
          xsumHi(when(col("v").isNotNull, col("w")))).as("ndvi"),
        r6(xsumHi(when(col("v").isNotNull, col("w")))).as("w_valid"))
      .withColumn("lon", r6(lit(DstGrid.west) + (col("tx") + 0.5) * DstGrid.pxLon))
      .withColumn("lat", r6(lit(DstGrid.north) + (col("ty") + 0.5) * DstGrid.pxLat))
      .select(col("ty"), col("tx"), col("lon"), col("lat"),
        col("ndvi"), col("w_valid"))
      .orderBy("ty", "tx")
  }

  val bilinearAffineSql: String = Pixels.withPixels(
    s"""WITH src AS (
       |$sourceGridSql
       |), corners AS (
       |  SELECT * FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS t(dy, dx)
       |), targets AS (
       |  SELECT ty.g AS ty, tx.g AS tx, dy, dx,
       |    ${DstGrid.west} + ((tx.g + 0.5) * ${DstGrid.pxLon}) AS lon,
       |    ${DstGrid.north} + ((ty.g + 0.5) * ${DstGrid.pxLat}) AS lat
       |  FROM (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) ty,
       |       (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) tx,
       |       corners
       |), mapped AS (
       |  SELECT ty, tx, dy, dx,
       |    ((lon - ${SrcGrid.west}) / ${SrcGrid.pxLon}) - 0.5 AS sx,
       |    ((lat - ${SrcGrid.north}) / ${SrcGrid.pxLat}) - 0.5 AS sy
       |  FROM targets
       |), weighted AS (
       |  SELECT ty, tx,
       |    least(greatest(CAST(floor(sy) AS INT) + dy, 0), ${SrcSize - 1}) AS ny,
       |    least(greatest(CAST(floor(sx) AS INT) + dx, 0), ${SrcSize - 1}) AS nx,
       |    (CASE WHEN dy = 0 THEN 1.0 - (sy - floor(sy)) ELSE sy - floor(sy) END)
       |    * (CASE WHEN dx = 0 THEN 1.0 - (sx - floor(sx)) ELSE sx - floor(sx) END) AS w
       |  FROM mapped
       |)
       |SELECT ty, tx,
       |  0.0 + round(${DstGrid.west} + ((tx + 0.5) * ${DstGrid.pxLon}), 6) AS lon,
       |  0.0 + round(${DstGrid.north} + ((ty + 0.5) * ${DstGrid.pxLat}), 6) AS lat,
       |  0.0 + round(${xsumHiSql("CASE WHEN v IS NOT NULL THEN w * v END")}
       |        / ${xsumHiSql("CASE WHEN v IS NOT NULL THEN w END")}, 6) AS ndvi,
       |  0.0 + round(${xsumHiSql("CASE WHEN v IS NOT NULL THEN w END")}, 6) AS w_valid
       |FROM weighted LEFT JOIN src ON ny = src.y AND nx = src.x
       |GROUP BY ty, tx
       |ORDER BY ty, tx""".stripMargin)

  // ---------------------------------------------------------------- g04
  /** Synthetic UTM georeferencing of the 32×32 source: zone 32N (the
    * zone containing 10°E), 30 m pixels (the HLS native resolution),
    * anchored at the TM projection of the degree grid's NW corner,
    * rounded to whole meters. Source cell (y, x) centers sit at
    * `E = east0 + (x+0.5)·30`, `N = north0 − (y+0.5)·30`. */
  val UtmZone = 32
  val UtmPx = 30.0
  val (utmEast0, utmNorth0) = {
    val (e, n) = Utm.forward(SrcGrid.north, SrcGrid.west, UtmZone)
    (math.rint(e), math.rint(n))
  }

  /** Target-cell relation of the UTM warp (g04): each WGS84 target cell
    * center projected through the real Transverse-Mercator forward
    * ([[Utm.forward]]) into zone-32 meters, then through the inverse
    * UTM-source affine to fractional source pixels. Computed on the
    * driver because it is MODEL-sized — one row per target cell of ONE
    * tile's grid, exactly the transform object rasterio builds per
    * warp; a tile fleet computes the same mapping per task via
    * [[utmKernel]]. Injecting the projected coordinates as literals
    * into BOTH engines keeps the oracle hash-exact (sin/cos are not
    * bit-identical across libm implementations; +,−,×,÷,√ are), while
    * the data-touching arithmetic — weights, renormalizing bilinear
    * aggregation — stays fully oracle-verified in-plan. */
  private[graft] def utmTargets: Seq[(Int, Int, Double, Double, Double, Double)] =
    for { ty <- 0 until DstSize; tx <- 0 until DstSize } yield {
      val lon = DstGrid.west + (tx + 0.5) * DstGrid.pxLon
      val lat = DstGrid.north + (ty + 0.5) * DstGrid.pxLat
      val (e, n) = Utm.forward(lat, lon, UtmZone)
      val sx = (e - utmEast0) / UtmPx - 0.5
      val sy = (n - utmNorth0) / (-UtmPx) - 0.5
      (ty, tx, e, n, sy, sx)
    }

  /** UTM→WGS84 bilinear warp (g04; the real-CRS face of g03): the
    * source raster is georeferenced in UTM meters, the target grid in
    * degrees, and the mapping runs through the TM forward projection —
    * anisotropic scale (lon pixels ≈19 m at 50°N vs 30 m northing) and
    * grid convergence included, not an affine. Sampling semantics and
    * scale posture are exactly g03's. */
  val bilinearUtm: Q = (s, d) => {
    val src = sourceGrid(s, d)
    val targets0 = s.createDataFrame(
      s.sparkContext.parallelize(
        utmTargets.map { case (ty, tx, e, n, sy, sx) =>
          Row(ty, tx, e, n, sy, sx) }, 1),
      StructType(Seq(
        StructField("ty", IntegerType, false),
        StructField("tx", IntegerType, false),
        StructField("easting", DoubleType, false),
        StructField("northing", DoubleType, false),
        StructField("sy", DoubleType, false),
        StructField("sx", DoubleType, false))))
    val corners = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF(s)("dy", "dx")
    val targets = targets0.crossJoin(corners)
      .withColumn("fy", col("sy") - floor(col("sy")))
      .withColumn("fx", col("sx") - floor(col("sx")))
      .withColumn("ny", least(greatest(floor(col("sy")).cast("int") + col("dy"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(floor(col("sx")).cast("int") + col("dx"), lit(0)), lit(SrcSize - 1)))
      .withColumn("w",
        (when(col("dy") === 0, lit(1.0) - col("fy")).otherwise(col("fy"))) *
          (when(col("dx") === 0, lit(1.0) - col("fx")).otherwise(col("fx"))))
    targets.join(src, col("ny") === col("y") && col("nx") === col("x"), "left")
      .groupBy("ty", "tx", "easting", "northing")
      .agg(
        r6(xsumHi(when(col("v").isNotNull, col("w") * col("v"))) /
          xsumHi(when(col("v").isNotNull, col("w")))).as("ndvi"),
        r6(xsumHi(when(col("v").isNotNull, col("w")))).as("w_valid"))
      .select(col("ty"), col("tx"),
        r6(col("easting")).as("easting"), r6(col("northing")).as("northing"),
        col("ndvi"), col("w_valid"))
      .orderBy("ty", "tx")
  }

  val bilinearUtmSql: String = {
    // exact decimal expansion round-trips the projected doubles
    // bit-for-bit into DuckDB
    def lit(d: Double): String = new java.math.BigDecimal(d).toPlainString
    val values = utmTargets.map { case (ty, tx, e, n, sy, sx) =>
      s"($ty, $tx, ${lit(e)}, ${lit(n)}, ${lit(sy)}, ${lit(sx)})"
    }.mkString(",\n    ")
    Pixels.withPixels(
      s"""WITH src AS (
         |$sourceGridSql
         |), corners AS (
         |  SELECT * FROM (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS t(dy, dx)
         |), targets AS (
         |  SELECT * FROM (VALUES
         |    $values
         |  ) AS t(ty, tx, easting, northing, sy, sx)
         |), weighted AS (
         |  SELECT ty, tx, easting, northing,
         |    least(greatest(CAST(floor(sy) AS INT) + dy, 0), ${SrcSize - 1}) AS ny,
         |    least(greatest(CAST(floor(sx) AS INT) + dx, 0), ${SrcSize - 1}) AS nx,
         |    (CASE WHEN dy = 0 THEN 1.0 - (sy - floor(sy)) ELSE sy - floor(sy) END)
         |    * (CASE WHEN dx = 0 THEN 1.0 - (sx - floor(sx)) ELSE sx - floor(sx) END) AS w
         |  FROM targets, corners
         |)
         |SELECT ty, tx,
         |  0.0 + round(easting, 6) AS easting,
         |  0.0 + round(northing, 6) AS northing,
         |  0.0 + round(${xsumHiSql("CASE WHEN v IS NOT NULL THEN w * v END")}
         |        / ${xsumHiSql("CASE WHEN v IS NOT NULL THEN w END")}, 6) AS ndvi,
         |  0.0 + round(${xsumHiSql("CASE WHEN v IS NOT NULL THEN w END")}, 6) AS w_valid
         |FROM weighted LEFT JOIN src ON ny = src.y AND nx = src.x
         |GROUP BY ty, tx, easting, northing
         |ORDER BY ty, tx""".stripMargin)
  }

  /** Dense-kernel twin of [[bilinearUtm]]: warps a full tile through
    * the TM forward per target cell INSIDE the task — the executor-side
    * form of the mapping the relational query injects as literals;
    * ResampleSpec asserts agreement. */
  def utmKernel(src: Array[Array[Option[Double]]],
      east0: Double, north0: Double, px: Double, zone: Int,
      dstSpec: GridSpec): Array[Array[Option[Double]]] =
    Array.tabulate(dstSpec.height, dstSpec.width) { (ty, tx) =>
      val lon = dstSpec.west + (tx + 0.5) * dstSpec.pxLon
      val lat = dstSpec.north + (ty + 0.5) * dstSpec.pxLat
      val (e, n) = Utm.forward(lat, lon, zone)
      val sx = (e - east0) / px - 0.5
      val sy = (n - north0) / (-px) - 0.5
      val y0 = math.floor(sy).toInt; val fy = sy - math.floor(sy)
      val x0 = math.floor(sx).toInt; val fx = sx - math.floor(sx)
      var num = 0.0; var den = 0.0
      for ((dy, dx) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) {
        val ny = math.min(math.max(y0 + dy, 0), src.length - 1)
        // x clamps against the ROW's width, not the row count — the two
        // only coincide on a square raster
        val nx = math.min(math.max(x0 + dx, 0), src(ny).length - 1)
        val w = (if (dy == 0) 1.0 - fy else fy) * (if (dx == 0) 1.0 - fx else fx)
        src(ny)(nx).foreach { v => num += w * v; den += w }
      }
      if (den == 0.0) None else Some(num / den)
    }

  /** Nearest-neighbor resample of the categorical fmask majority grid
    * (reference processor.py:241-251 uses nearest for Fmask). */
  val nearestRelational: Q = (s, d) => {
    val src = Pixels.pixels(s, d)
      .groupBy("y", "x")
      .agg(min("fmask").as("fmask")) // deterministic per-cell class
    val ty = s.range(DstSize).select(col("id").cast("int").as("ty"))
    val tx = s.range(DstSize).select(col("id").cast("int").as("tx"))
    ty.crossJoin(tx)
      .withColumn("ny", least(greatest(
        round((col("ty") + 0.5) * Scale - 0.5).cast("int"), lit(0)), lit(SrcSize - 1)))
      .withColumn("nx", least(greatest(
        round((col("tx") + 0.5) * Scale - 0.5).cast("int"), lit(0)), lit(SrcSize - 1)))
      .join(src, col("ny") === col("y") && col("nx") === col("x"))
      .select(col("ty"), col("tx"), col("fmask"))
      .orderBy("ty", "tx")
  }

  val nearestRelationalSql: String = Pixels.withPixels(
    s"""WITH src AS (
       |  SELECT y, x, min(fmask) AS fmask FROM pixels GROUP BY y, x
       |)
       |SELECT ty.g AS ty, tx.g AS tx, fmask
       |FROM (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) ty,
       |     (SELECT unnest(generate_series(0, ${DstSize - 1})) AS g) tx
       |JOIN src
       |  ON src.y = least(greatest(CAST(round((ty.g + 0.5) * $Scale - 0.5) AS INT), 0), ${SrcSize - 1})
       | AND src.x = least(greatest(CAST(round((tx.g + 0.5) * $Scale - 0.5) AS INT), 0), ${SrcSize - 1})
       |ORDER BY ty, tx""".stripMargin)

  /** Dense-kernel twin of [[bilinearRelational]]: warp a full tile held
    * as an Array inside one task (option (a)); used per-tile where a
    * tile fits in memory. */
  def bilinearKernel(src: Array[Array[Option[Double]]], dstSize: Int): Array[Array[Option[Double]]] = {
    val n = src.length
    val scale = n.toDouble / dstSize
    Array.tabulate(dstSize, dstSize) { (ty, tx) =>
      val sy = (ty + 0.5) * scale - 0.5
      val sx = (tx + 0.5) * scale - 0.5
      val y0 = math.floor(sy).toInt; val fy = sy - math.floor(sy)
      val x0 = math.floor(sx).toInt; val fx = sx - math.floor(sx)
      var num = 0.0; var den = 0.0
      for ((dy, dx) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) {
        val ny = math.min(math.max(y0 + dy, 0), n - 1)
        val nx = math.min(math.max(x0 + dx, 0), n - 1)
        val w = (if (dy == 0) 1.0 - fy else fy) * (if (dx == 0) 1.0 - fx else fx)
        src(ny)(nx).foreach { v => num += w * v; den += w }
      }
      if (den == 0.0) None else Some(num / den)
    }
  }

  /** Dense-kernel twin of [[bilinearAffine]]: warp a full tile through
    * the two affines inside one task; ResampleSpec asserts agreement
    * with the relational form on the testdata grid. */
  def affineKernel(src: Array[Array[Option[Double]]],
      srcSpec: GridSpec, dstSpec: GridSpec): Array[Array[Option[Double]]] =
    Array.tabulate(dstSpec.height, dstSpec.width) { (ty, tx) =>
      val lon = dstSpec.west + (tx + 0.5) * dstSpec.pxLon
      val lat = dstSpec.north + (ty + 0.5) * dstSpec.pxLat
      val sx = (lon - srcSpec.west) / srcSpec.pxLon - 0.5
      val sy = (lat - srcSpec.north) / srcSpec.pxLat - 0.5
      val y0 = math.floor(sy).toInt; val fy = sy - math.floor(sy)
      val x0 = math.floor(sx).toInt; val fx = sx - math.floor(sx)
      var num = 0.0; var den = 0.0
      for ((dy, dx) <- Seq((0, 0), (0, 1), (1, 0), (1, 1))) {
        val ny = math.min(math.max(y0 + dy, 0), srcSpec.height - 1)
        val nx = math.min(math.max(x0 + dx, 0), srcSpec.width - 1)
        val w = (if (dy == 0) 1.0 - fy else fy) * (if (dx == 0) 1.0 - fx else fx)
        src(ny)(nx).foreach { v => num += w * v; den += w }
      }
      if (den == 0.0) None else Some(num / den)
    }

  val queries: Map[String, Q] = Map(
    "g01_resample_bilinear" -> bilinearRelational,
    "g02_resample_nearest" -> nearestRelational,
    "g03_resample_affine" -> bilinearAffine,
    "g04_resample_utm" -> bilinearUtm)

  val oracle: Map[String, String] = Map(
    "g01_resample_bilinear" -> bilinearRelationalSql,
    "g02_resample_nearest" -> nearestRelationalSql,
    "g03_resample_affine" -> bilinearAffineSql,
    "g04_resample_utm" -> bilinearUtmSql)
}
