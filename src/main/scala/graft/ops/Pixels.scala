package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops.Indices.QcConfig

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
  * (processor.py:258). A granule is one (tile_id, time) pair; `time`
  * carries an intra-day hour offset keyed on tile parity, so tiles {0,2}
  * and {1,3} share exact timestamps (exercising the same-timestamp
  * spatial merge, merger.py:16-54) while each calendar date still has two
  * distinct granule timestamps (exercising the same-day merge's
  * mean-of-timestamps, merger.py:56-93).
  *
  * `px_id` (l_orderkey * 8 + l_linenumber) is a row key but NOT unique —
  * the synthetic lineitem contains duplicate (orderkey, linenumber)
  * pairs — so every oracle-checked per-pixel query orders by px_id PLUS
  * all remaining output columns (a total preorder whose ties are
  * identical rows), with NULLS FIRST spelled explicitly in the oracle SQL
  * to match Spark's ascending default. The driver's hash compare is
  * order-sensitive.
  */
object Pixels {

  /** Spark-side pixel relation. Keep in lockstep with [[sql]]. */
  def pixels(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.select(
      (col("l_orderkey") * 8 + col("l_linenumber")).as("px_id"),
      (col("l_suppkey") % 4).as("tile_id"),
      to_date(col("l_shipdate")).as("date"),
      expr("timestampadd(HOUR, CAST(l_suppkey % 2 AS INT) * 3, l_shipdate)").as("time"),
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
    """SELECT l_orderkey * 8 + l_linenumber AS px_id,
      |  l_suppkey % 4 AS tile_id,
      |  CAST(l_shipdate AS DATE) AS date,
      |  l_shipdate + to_hours(CAST(l_suppkey % 2 AS INT) * 3) AS time,
      |  CAST(l_orderkey % 32 AS INT) AS y,
      |  CAST(l_partkey % 32 AS INT) AS x,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE l_extendedprice % 12000.0 END AS red,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE (l_extendedprice * (1.0 + l_discount)) % 12000.0 END AS nir,
      |  CASE WHEN l_tax > 0.07 THEN NULL ELSE (l_quantity * 60.0) % 2000.0 END AS blue,
      |  CAST(l_linenumber % 6 AS INT) AS fmask
      |FROM lineitem""".stripMargin

  /** Wrap an oracle body with the pixels CTE; if the body opens its own
    * WITH-list, splice into one combined CTE list. */
  def withPixels(body: String): String = {
    val b = body.trim
    if (b.toUpperCase.startsWith("WITH "))
      s"WITH pixels AS (\n$sql\n), ${b.drop(5)}"
    else
      s"WITH pixels AS (\n$sql\n)\n$b"
  }

  /** Oracle SQL fragments mirroring Indices, generated from the same
    * QcConfig the Scala predicates use — one source of truth for the
    * thresholds (a non-default cfg changes both sides together). */
  final case class Sql(cfg: QcConfig = Indices.DefaultQc) {
    val outside = "(red IS NULL OR nir IS NULL OR blue IS NULL)"
    val cloudShadow = s"(fmask IN (2,4) AND NOT $outside)"
    val anomalyLow = s"(red < ${cfg.reflectanceLow} OR nir < ${cfg.reflectanceLow})"
    val anomalyHigh = s"(red > ${cfg.reflectanceHigh} OR nir > ${cfg.reflectanceHigh})"
    val haze = s"(blue > ${cfg.blueHaze})"
    val ndvi = "((nir - red) / (nir + red + 1e-6))"
    val evi = "(2.5 * (nir - red) / (nir + 6.0 * red - 7.5 * blue + 1.0))"
    val invalidNdvi = s"($ndvi < ${cfg.ndviMin} OR $ndvi > ${cfg.ndviMax})"
    val combinedMask =
      s"($outside OR coalesce($cloudShadow,false) OR coalesce($anomalyLow,false) " +
        s"OR coalesce($anomalyHigh,false) OR coalesce($haze,false) OR coalesce($invalidNdvi,false))"
    val ndviMasked = s"(CASE WHEN $combinedMask THEN NULL ELSE $ndvi END)"
    val eviMasked = s"(CASE WHEN $combinedMask THEN NULL ELSE $evi END)"
    /** NULL-propagating clip — see Indices.clip. */
    def clip(e: String, lo: Double, hi: Double): String =
      s"(CASE WHEN ($e) IS NULL THEN NULL ELSE greatest($lo, least($hi, $e)) END)"
    val ndviClipped = clip(ndviMasked, -1.0, 1.0)
    val eviClipped = clip(eviMasked, -3.0, 3.0)
  }

  val Sql0: Sql = Sql()
}
