package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric-determinism helpers shared by every oracle-checked query.
  *
  * Floating sums are order-dependent; at 100 TB the summation order is
  * whatever the shuffle produced, so any query that must hash-match an
  * oracle routes per-row doubles through an exact DECIMAL accumulator
  * (order-independent, no precision loss at the declared scale) and only
  * converts back to double at the end. Averages/stddevs keep native double
  * accumulation (error is relative, absorbed by round-to-6).
  *
  * Oracle contract: every oracle query must mirror the identical per-row
  * cast — `CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE)` for [[xsum]],
  * scale 18 for [[xsumHi]] — a native double SUM on the oracle side can
  * drift past round-to-6 tolerance at scale. [[xsumSql]]/[[xsumHiSql]]
  * generate the spelling so both sides share one source of truth; the
  * cross-engine check is the Verify → devtools/check.py loop (every
  * declared aggregate is exercised against DuckDB at sf0.01).
  */
object Num {
  /** Exact, order-independent sum of a double expression (money-scale). */
  def xsum(c: Column): Column = sum(c.cast("decimal(38,6)")).cast("double")

  /** Exact sum at scale 18 for unit-magnitude values (embedding dot
    * products and norms, where 6 decimals would swallow the signal). */
  def xsumHi(c: Column): Column = sum(c.cast("decimal(38,18)")).cast("double")

  /** SQL spelling of [[xsum]] for oracle queries.
    *
    * The final decimal→double conversion is VARCHAR-mediated: DuckDB's
    * direct `CAST(DECIMAL AS DOUBLE)` converts the int128 unscaled value
    * to double FIRST and divides by 10^scale second — two roundings, up
    * to 1 ulp off nearest once the sum carries more significant digits
    * than a double (measured at sf1: 2 of 6 pricing-summary groups).
    * Decimal→VARCHAR is exact and strtod is correctly rounded, which is
    * also exactly what Spark's `Decimal.toDouble` (BigDecimal) produces —
    * so both engines land on the identical bit pattern at any scale. */
  def xsumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"

  /** SQL spelling of [[xsumHi]] for oracle queries. */
  def xsumHiSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(38,18))) AS VARCHAR) AS DOUBLE)"

  /** Round for oracle comparison (absorbs cross-engine accumulation order).
    *
    * Negative-zero contract: Spark's Round goes through java BigDecimal,
    * which cannot represent -0.0, so r6/r4 never emit a signed zero. DuckDB's
    * round() keeps the sign when a tiny negative rounds to zero, and the
    * driver's compare hashes values (where -0.0 != 0.0 even though they
    * compare ==). Every oracle SQL therefore spells `0.0 + round(...)` —
    * IEEE addition normalizes -0.0 + 0.0 to +0.0 — keeping both engines on
    * the same bit pattern. devtools/check.py compares float bits to enforce
    * this. */
  def r6(c: Column): Column = round(c, 6)
  def r4(c: Column): Column = round(c, 4)

  /** Driver-side replica of [[xsumHi]]'s per-element cast: Spark's
    * double→DECIMAL(38,18) cast parses `Double.toString` at scale 18
    * HALF_UP. The hash-locked IVF numerics (v08) depend on the driver
    * and the distributed aggregate agreeing bit-for-bit, so every
    * driver-side spelling must come from HERE — a second copy that
    * drifts (e.g. a rounding-mode tweak) would silently desynchronize
    * training from assignment. */
  def decHi(x: Double): java.math.BigDecimal =
    new java.math.BigDecimal(java.lang.Double.toString(x))
      .setScale(18, java.math.RoundingMode.HALF_UP)

  /** Driver-side replica of [[r6]] (Spark's Round(x, 6) on a double):
    * non-finite passes through; otherwise BigDecimal.valueOf — the
    * Double.toString parse Spark's Round goes through — setScale 6
    * HALF_UP, back to double. The k-means loop re-centers on the driver
    * (model-sized state), so its rounding must be THIS replica or the
    * hash-locked v08 model drifts from the oracle's distributed r6. */
  def r6d(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Exact driver-side vector norm: sqrt of the exact scale-18 decimal
    * sum of squares — bit-identical to `sqrt(xsumHi(c*c))` run
    * distributed, order-independent by the decimal accumulation. */
  def exactNorm(comps: Iterable[Double]): Double =
    math.sqrt(comps.map(c => decHi(c * c))
      .reduce(_.add(_)).doubleValue())
}
