package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Num._

/** Per-pixel projection/filter queries over the pixel relation
  * (SURVEY.md §2.3: proj_ndvi/evi, pred_* masks, proj_mask_to_null,
  * proj_clip, proj_nodata_fill, filter_downsample, proj_*_isel).
  *
  * All expressions are built-in Catalyst `Column`s — the whole §2.3 block
  * stays inside one whole-stage-codegen span with filters pushed to the
  * parquet scan; nothing here shuffles.
  */
object PixelOps {

  type Q = (SparkSession, String) => DataFrame

  /** Attach the full index/mask/clip column set (one codegen span). */
  def withIndices(df: DataFrame): DataFrame = {
    val mask = Indices.combinedMask(col("red"), col("nir"), col("blue"), col("fmask"))
    df.withColumn("mask", mask)
      .withColumn("ndvi_m", Indices.maskToNull(Indices.ndvi(col("nir"), col("red")), col("mask")))
      .withColumn("evi_m", Indices.maskToNull(Indices.evi(col("nir"), col("red"), col("blue")), col("mask")))
      .withColumn("ndvi_c", Indices.clip(col("ndvi_m"), -1.0, 1.0))
      .withColumn("evi_c", Indices.clip(col("evi_m"), -3.0, 3.0))
  }

  /** Full §2.3 expression battery on one tile-year: indices, combined
    * mask, mask→NULL, NULL-propagating clip, sink-side nodata fill. */
  val pixelIndices: Q = (s, d) => {
    val px = withIndices(Pixels.pixels(s, d))
    px.filter(col("tile_id") === 1 && year(col("date")) === 1996)
      .select(
        col("px_id"), col("y"), col("x"),
        col("mask"),
        r6(col("ndvi_m")).as("ndvi"),
        r6(col("evi_m")).as("evi"),
        r6(col("ndvi_c")).as("ndvi_clip"),
        r6(col("evi_c")).as("evi_clip"),
        r6(Indices.nodataFill(col("ndvi_c"))).as("ndvi_filled"))
      .orderBy("px_id", "y", "x", "mask", "ndvi", "evi", "ndvi_clip", "evi_clip", "ndvi_filled")
  }

  val pixelIndicesSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT px_id, y, x,
         |  ${f.combinedMask} AS mask,
         |  0.0 + round(${f.ndviMasked}, 6) AS ndvi,
         |  0.0 + round(${f.eviMasked}, 6) AS evi,
         |  0.0 + round(${f.ndviClipped}, 6) AS ndvi_clip,
         |  0.0 + round(${f.eviClipped}, 6) AS evi_clip,
         |  0.0 + round(coalesce(${f.ndviClipped}, -9999.0), 6) AS ndvi_filled
         |FROM pixels
         |WHERE tile_id = 1 AND year(date) = 1996
         |ORDER BY px_id, y, x, mask, ndvi NULLS FIRST, evi NULLS FIRST,
         |  ndvi_clip NULLS FIRST, evi_clip NULLS FIRST, ndvi_filled""".stripMargin)
  }

  /** Stride-downsample + reindex + nodata fill (arcgis.py:59-80 export
    * path): keep every 2nd pixel in y and x, halve the grid coords. */
  val downsampleExport: Q = (s, d) => {
    val px = withIndices(Pixels.pixels(s, d))
    px.filter(col("tile_id") === 2 && year(col("date")) === 1997 &&
        Indices.downsample(col("y"), col("x"), 2))
      .select(
        col("px_id"),
        expr("y div 2").cast("int").as("y2"),
        expr("x div 2").cast("int").as("x2"),
        r6(Indices.nodataFill(col("ndvi_c"))).as("ndvi_filled"),
        r6(Indices.nodataFill(col("evi_c"))).as("evi_filled"))
      .orderBy("px_id", "y2", "x2", "ndvi_filled", "evi_filled")
  }

  val downsampleExportSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT px_id,
         |  CAST(y // 2 AS INT) AS y2,
         |  CAST(x // 2 AS INT) AS x2,
         |  0.0 + round(coalesce(${f.ndviClipped}, -9999.0), 6) AS ndvi_filled,
         |  0.0 + round(coalesce(${f.eviClipped}, -9999.0), 6) AS evi_filled
         |FROM pixels
         |WHERE tile_id = 2 AND year(date) = 1997 AND y % 2 = 0 AND x % 2 = 0
         |ORDER BY px_id, y2, x2, ndvi_filled, evi_filled""".stripMargin)
  }

  /** One pixel's full time series (proj_pixel_isel,
    * visualize_dataset.py:164-166). */
  val pixelIsel: Q = (s, d) => {
    val px = withIndices(Pixels.pixels(s, d))
    px.filter(col("tile_id") === 1 && col("y") === 5 && col("x") === 7)
      .select(
        col("px_id"),
        date_format(col("time"), "yyyy-MM-dd HH:mm:ss").as("t"),
        r6(col("ndvi_c")).as("ndvi"))
      .orderBy("px_id", "t", "ndvi")
  }

  val pixelIselSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT px_id,
         |  strftime(time, '%Y-%m-%d %H:%M:%S') AS t,
         |  0.0 + round(${f.ndviClipped}, 6) AS ndvi
         |FROM pixels
         |WHERE tile_id = 1 AND y = 5 AND x = 7
         |ORDER BY px_id, t, ndvi NULLS FIRST""".stripMargin)
  }

  /** One time slice of the cube (proj_timestamp_isel, arcgis.py:56-57). */
  val timestampIsel: Q = (s, d) => {
    val px = withIndices(Pixels.pixels(s, d))
    px.filter(col("date") === lit("1996-03-15"))
      .select(
        col("px_id"), col("tile_id"), col("y"), col("x"),
        r6(col("ndvi_c")).as("ndvi"), r6(col("evi_c")).as("evi"))
      .orderBy("px_id", "tile_id", "y", "x", "ndvi", "evi")
  }

  val timestampIselSql: String = {
    val f = Pixels.Sql0
    Pixels.withPixels(
      s"""SELECT px_id, tile_id, y, x,
         |  0.0 + round(${f.ndviClipped}, 6) AS ndvi,
         |  0.0 + round(${f.eviClipped}, 6) AS evi
         |FROM pixels
         |WHERE date = DATE '1996-03-15'
         |ORDER BY px_id, tile_id, y, x, ndvi NULLS FIRST, evi NULLS FIRST""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "p01_pixel_indices" -> pixelIndices,
    "p02_downsample_export" -> downsampleExport,
    "p03_pixel_isel" -> pixelIsel,
    "p04_timestamp_isel" -> timestampIsel)

  val oracle: Map[String, String] = Map(
    "p01_pixel_indices" -> pixelIndicesSql,
    "p02_downsample_export" -> downsampleExportSql,
    "p03_pixel_isel" -> pixelIselSql,
    "p04_timestamp_isel" -> timestampIselSql)
}
