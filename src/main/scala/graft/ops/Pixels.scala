package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic synthetic pixel relation derived from `lineitem`.
  *
  * The driver testdata has no raster tables, but the DuckDB oracle must be
  * able to reproduce every input bit-for-bit, so the raster-shaped operator
  * queries (SURVEY.md §2.3/§2.4/§2.6 domain ops) run over a pixel relation
  * synthesized with pure integer/double arithmetic from lineitem columns.
  * The same arithmetic is spelled in the oracle SQL (`Pixels.sql`).
  *
  * Shape mirrors FIXTURES.md §B1: one row per pixel-observation with
  * granule/tile/time keys, three reflectance bands and an fmask class.
  * NULL bands model the reference's outside-the-footprint NaN pixels
  * (processor.py:258).
  */
object Pixels {

  /** Spark-side pixel relation. Keep in lockstep with [[sql]]. */
  def pixels(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(
      (col("l_suppkey") % 4).as("tile_id"),
      to_date(col("l_shipdate")).as("date"),
      col("l_shipdate").as("time"),
      (col("l_orderkey") % 32).cast("int").as("y"),
      (col("l_partkey") % 32).cast("int").as("x"),
      // bands: reflectance-scaled doubles; NULL = outside polygon
      when(col("l_tax") > 0.07, lit(null))
        .otherwise(col("l_extendedprice") % 12000.0).as("red"),
      when(col("l_tax") > 0.07, lit(null))
        .otherwise((col("l_extendedprice") * (lit(1.0) + col("l_discount"))) % 12000.0)
        .as("nir"),
      when(col("l_tax") > 0.07, lit(null))
        .otherwise((col("l_quantity") * 60.0) % 2000.0).as("blue"),
      (col("l_linenumber") % 6).cast("int").as("fmask"))
  }

  /** DuckDB-side identical relation (ANSI-ish SQL over the same parquet).
    * `%` on doubles is fmod in both engines; all dividends are positive. */
  val sql: String =
    """SELECT l_suppkey % 4 AS tile_id,
      |  CAST(l_shipdate AS DATE) AS date,
      |  l_shipdate AS time,
      |  CAST(l_orderkey % 32 AS INT) AS y,
      |  CAST(l_partkey % 32 AS INT) AS x,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE l_extendedprice % 12000.0 END AS red,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE (l_extendedprice * (1.0 + l_discount)) % 12000.0 END AS nir,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE (l_quantity * 60.0) % 2000.0 END AS blue,
      |  CAST(l_linenumber % 6 AS INT) AS fmask
      |FROM lineitem""".stripMargin

  /** Oracle SQL fragments mirroring Indices; single source of truth for
    * the thresholds is Indices.QcConfig — spelled as literals here. */
  object Sql {
    val outside = "(red IS NULL OR nir IS NULL OR blue IS NULL)"
    val cloudShadow = s"(fmask IN (2,4) AND NOT $outside)"
    val anomalyLow = "(red < 100.0 OR nir < 100.0)"
    val anomalyHigh = "(red > 10000.0 OR nir > 10000.0)"
    val haze = "(blue > 1500.0)"
    val ndvi = "((nir - red) / (nir + red + 1e-6))"
    val invalidNdvi = s"($ndvi < -0.5 OR $ndvi > 0.95)"
    val combinedMask =
      s"($outside OR coalesce($cloudShadow,false) OR coalesce($anomalyLow,false) " +
        s"OR coalesce($anomalyHigh,false) OR coalesce($haze,false) OR coalesce($invalidNdvi,false))"
  }
}
