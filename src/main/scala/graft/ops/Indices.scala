package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Band-math projections and mask predicates over the pixel relation
  * (SURVEY.md §2.3). Pure `Column => Column` combinators — every one is a
  * built-in Catalyst expression, so the whole set stays inside one
  * whole-stage-codegen span and is pushed/pruned/CSE'd by the optimizer.
  *
  * Reference semantics: /root/reference/core/processor.py:258-301 and
  * config/settings.py:5-26. NaN-as-missing in the reference is NULL here
  * (SURVEY.md §7.4 #1): `when(..., null)` + null-skipping aggregates give
  * exactly numpy's nan-semantics without NaN's broken ordering/equality.
  */
object Indices {

  /** Thresholds from the reference's config/settings.py:5-26. */
  final case class QcConfig(
      reflectanceLow: Double = 100.0,
      reflectanceHigh: Double = 10000.0,
      blueHaze: Double = 1500.0,
      ndviMin: Double = -0.5,
      ndviMax: Double = 0.95,
      maxContaminationPct: Double = 30.0,
      minValidPct: Double = 10.0)

  val DefaultQc: QcConfig = QcConfig()

  /** ndvi = (nir - red) / (nir + red + 1e-6) — processor.py:294. */
  def ndvi(nir: Column, red: Column): Column =
    (nir - red) / (nir + red + lit(1e-6))

  /** evi = 2.5 (nir - red) / (nir + 6 red - 7.5 blue + 1) — processor.py:295. */
  def evi(nir: Column, red: Column, blue: Column): Column =
    lit(2.5) * (nir - red) / (nir + lit(6.0) * red - lit(7.5) * blue + lit(1.0))

  /** Pixel fell outside the AOI footprint after warp — processor.py:258. */
  def outsidePolygon(red: Column, nir: Column, blue: Column): Column =
    red.isNull || nir.isNull || blue.isNull

  /** Fmask class 2 (shadow) or 4 (cloud) — processor.py:260. */
  def cloudShadow(fmask: Column, outside: Column): Column =
    fmask.isin(2, 4) && !outside

  /** Reflectance below the plausible floor — processor.py:261. */
  def anomalyLow(red: Column, nir: Column, cfg: QcConfig = DefaultQc): Column =
    (red < cfg.reflectanceLow) || (nir < cfg.reflectanceLow)

  /** Reflectance above the plausible ceiling — processor.py:262. */
  def anomalyHigh(red: Column, nir: Column, cfg: QcConfig = DefaultQc): Column =
    (red > cfg.reflectanceHigh) || (nir > cfg.reflectanceHigh)

  /** Haze: blue above threshold — processor.py:263. */
  def haze(blue: Column, cfg: QcConfig = DefaultQc): Column =
    blue > cfg.blueHaze

  /** Preliminary NDVI outside the plausible band — processor.py:265-266.
    * Catalyst CSE dedups the NDVI recompute (SURVEY.md §4 #4). */
  def invalidNdvi(nir: Column, red: Column, cfg: QcConfig = DefaultQc): Column = {
    val n = ndvi(nir, red)
    (n < cfg.ndviMin) || (n > cfg.ndviMax)
  }

  /** OR of all six masks — processor.py:268. NULL-safe: outside-polygon
    * pixels have NULL bands, so the other predicates go NULL; coalesce each
    * leg to false so `outside` alone decides. */
  def combinedMask(red: Column, nir: Column, blue: Column, fmask: Column,
      cfg: QcConfig = DefaultQc): Column = {
    val outside = outsidePolygon(red, nir, blue)
    val legs = Seq(
      cloudShadow(fmask, outside),
      anomalyLow(red, nir, cfg),
      anomalyHigh(red, nir, cfg),
      haze(blue, cfg),
      invalidNdvi(nir, red, cfg))
    legs.map(c => coalesce(c, lit(false))).foldLeft(outside)(_ || _)
  }

  /** Masked values become missing — processor.py:297-298 (NaN → NULL). */
  def maskToNull(value: Column, mask: Column): Column =
    when(mask, lit(null)).otherwise(value)

  /** Clamp into [lo, hi] — processor.py:300-301 (np.clip). NULL-propagating:
    * Spark's least/greatest skip NULL operands, so a bare
    * greatest(lo, least(hi, c)) would turn a masked (NULL) pixel into `hi`;
    * numpy's clip propagates NaN, so missing must stay missing here. */
  def clip(c: Column, lo: Double, hi: Double): Column =
    when(c.isNull, lit(null))
      .otherwise(greatest(lit(lo), least(lit(hi), c)))

  /** Export-side missing → sentinel — arcgis.py:79-80. */
  def nodataFill(c: Column, sentinel: Double = -9999.0): Column =
    coalesce(c, lit(sentinel))

  /** Ingest-side sentinel → missing — processor.py:213 (src_nodata=-9999). */
  def nodataToNull(c: Column, sentinel: Double = -9999.0): Column =
    nullif(c, lit(sentinel))

  /** Keep every d-th pixel in y and x — arcgis.py:59-61 (`arr[::d, ::d]`). */
  def downsample(y: Column, x: Column, d: Int): Column =
    (y % d === 0) && (x % d === 0)
}
