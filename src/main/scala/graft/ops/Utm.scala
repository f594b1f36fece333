package graft.ops

/** Transverse-Mercator forward/inverse on the WGS84 ellipsoid — the
  * real datum math behind the reference's CRS warp (processor.py:205-239
  * reprojects HLS tiles from their native UTM zone to EPSG:4326 through
  * rasterio/PROJ). Standard series formulas from the public literature
  * (Snyder, "Map Projections — A Working Manual", USGS PP 1395,
  * pp. 60-64, eqs. 8-9..8-25 / 3-21), truncated at the conventional
  * e⁶/e1⁴ terms — sub-millimeter over a UTM zone's extent, which
  * ResampleSpec bounds with a forward∘inverse round-trip and an
  * independent numeric meridian-arc integration.
  */
object Utm {

  /** WGS84 defining constants. */
  val SemiMajor = 6378137.0
  val Flattening = 1.0 / 298.257223563
  val E2: Double = Flattening * (2.0 - Flattening)
  val Ep2: Double = E2 / (1.0 - E2)
  val K0 = 0.9996
  val FalseEasting = 500000.0

  /** Central meridian of a (northern-hemisphere) UTM zone, radians. */
  def centralMeridian(zone: Int): Double = math.toRadians(zone * 6.0 - 183.0)

  /** Meridian arc length from the equator to latitude φ (radians) —
    * Snyder eq. 3-21. */
  private[graft] def meridianArc(phi: Double): Double = {
    val e2 = E2; val e4 = e2 * e2; val e6 = e4 * e2
    SemiMajor * (
      (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi))
  }

  /** Forward projection: (lat°, lon°) → (easting m, northing m) in the
    * given zone — Snyder eqs. 8-9..8-14. */
  def forward(latDeg: Double, lonDeg: Double, zone: Int): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = SemiMajor / math.sqrt(1 - E2 * sinP * sinP)
    val t = tanP * tanP
    val c = Ep2 * cosP * cosP
    val a = (lam - centralMeridian(zone)) * cosP
    val a2 = a * a; val a3 = a2 * a; val a4 = a3 * a; val a5 = a4 * a; val a6 = a5 * a
    val easting = FalseEasting + K0 * n *
      (a + (1 - t + c) * a3 / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * Ep2) * a5 / 120)
    val northing = K0 * (meridianArc(phi) + n * tanP *
      (a2 / 2 + (5 - t + 9 * c + 4 * c * c) * a4 / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * Ep2) * a6 / 720))
    (easting, northing)
  }

  /** Inverse projection: (easting m, northing m) → (lat°, lon°) —
    * Snyder eqs. 8-17..8-25 via the footpoint latitude. */
  def inverse(easting: Double, northing: Double, zone: Int): (Double, Double) = {
    val m = northing / K0
    val e2 = E2; val e4 = e2 * e2; val e6 = e4 * e2
    val mu = m / (SemiMajor * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val se = math.sqrt(1 - e2)
    val e1 = (1 - se) / (1 + se)
    val e1_2 = e1 * e1; val e1_3 = e1_2 * e1; val e1_4 = e1_3 * e1
    val phi1 = mu +
      (3 * e1 / 2 - 27 * e1_3 / 32) * math.sin(2 * mu) +
      (21 * e1_2 / 16 - 55 * e1_4 / 32) * math.sin(4 * mu) +
      (151 * e1_3 / 96) * math.sin(6 * mu) +
      (1097 * e1_4 / 512) * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = Ep2 * cosP * cosP
    val t1 = tanP * tanP
    val sin2 = 1 - e2 * sinP * sinP
    val n1 = SemiMajor / math.sqrt(sin2)
    val r1 = SemiMajor * (1 - e2) / (sin2 * math.sqrt(sin2))
    val d = (easting - FalseEasting) / (n1 * K0)
    val d2 = d * d; val d3 = d2 * d; val d4 = d3 * d; val d5 = d4 * d; val d6 = d5 * d
    val phi = phi1 - (n1 * tanP / r1) *
      (d2 / 2 - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * Ep2) * d4 / 24 +
        (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * Ep2 - 3 * c1 * c1) * d6 / 720)
    val lam = centralMeridian(zone) +
      (d - (1 + 2 * t1 + c1) * d3 / 6 +
        (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * Ep2 + 24 * t1 * t1) * d5 / 120) / cosP
    (math.toDegrees(phi), math.toDegrees(lam))
  }
}
