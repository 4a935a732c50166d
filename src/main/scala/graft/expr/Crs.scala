package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Coordinate transforms for the CRSs the reference actually uses
  * (SURVEY.md §7 hard part (c)): UTM↔WGS84 (Sentinel/Landsat tiles,
  * collections/utils.py:223–237 extent reprojection, utils.py:486–522
  * SRID detection) and the MODIS sinusoidal grid (hdf.py). Implemented
  * from the standard USGS/Snyder Transverse Mercator series on the WGS84
  * ellipsoid rather than binding proj — only these projections occur.
  *
  * Used at ingest/publish time on extents and footprint vertices (a few
  * points per scene), so plain Scala + a UDF wrapper is the right
  * altitude — this is explicitly off the pixel hot path (same decision as
  * the convex hull; SURVEY §4).
  */
object Crs {

  private val a = 6378137.0                   // WGS84 semi-major axis
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)                // first eccentricity²
  private val ep2 = e2 / (1 - e2)             // second eccentricity²
  private val k0 = 0.9996
  private val e4 = e2 * e2
  private val e6 = e4 * e2

  /** Forward: (lat°, lon°) → (easting, northing) in the given UTM zone.
    * Southern-hemisphere northings carry the 10 000 000 m false northing. */
  def wgs84ToUtm(latDeg: Double, lonDeg: Double, zone: Int, north: Boolean): (Double, Double) = {
    require(zone >= 1 && zone <= 60, s"zone must be 1..60, got $zone")
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg)
    val lam0 = math.toRadians(zone * 6.0 - 183.0) // central meridian
    val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
    val n = a / math.sqrt(1 - e2 * sinP * sinP)
    val t = tanP * tanP
    val c = ep2 * cosP * cosP
    val bigA = (lam - lam0) * cosP
    val m = a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
      - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
      + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
      - (35 * e6 / 3072) * math.sin(6 * phi))
    val x = k0 * n * (bigA + (1 - t + c) * math.pow(bigA, 3) / 6
      + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120) + 500000.0
    val y0 = k0 * (m + n * tanP * (bigA * bigA / 2
      + (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24
      + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720))
    (x, if (north) y0 else y0 + 10000000.0)
  }

  /** Inverse: UTM (easting, northing) → (lat°, lon°). */
  def utmToWgs84(easting: Double, northing: Double, zone: Int, north: Boolean): (Double, Double) = {
    require(zone >= 1 && zone <= 60, s"zone must be 1..60, got $zone")
    val yAdj = if (north) northing else northing - 10000000.0
    val lam0 = math.toRadians(zone * 6.0 - 183.0)
    val m = yAdj / k0
    val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
    val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
    val phi1 = mu + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu) +
      (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu) +
      (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu) +
      (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu)
    val sinP1 = math.sin(phi1); val cosP1 = math.cos(phi1); val tanP1 = math.tan(phi1)
    val c1 = ep2 * cosP1 * cosP1
    val t1 = tanP1 * tanP1
    val n1 = a / math.sqrt(1 - e2 * sinP1 * sinP1)
    val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP1 * sinP1, 1.5)
    val d = (easting - 500000.0) / (n1 * k0)
    val phi = phi1 - (n1 * tanP1 / r1) * (d * d / 2
      - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24
      + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1) * math.pow(d, 6) / 720)
    val lam = lam0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
      + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1) * math.pow(d, 5) / 120) / cosP1
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  private val modisR = 6371007.181 // MODIS sinusoidal sphere radius (m)

  /** MODIS sinusoidal → (lat°, lon°). */
  def sinusoidalToWgs84(x: Double, y: Double): (Double, Double) = {
    val phi = y / modisR
    val lam = x / (modisR * math.cos(phi))
    (math.toDegrees(phi), math.toDegrees(lam))
  }

  /** (lat°, lon°) → MODIS sinusoidal metres. */
  def wgs84ToSinusoidal(latDeg: Double, lonDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    (modisR * math.toRadians(lonDeg) * math.cos(phi), modisR * phi)
  }

  /** UDF wrapper for extent/footprint reprojection at publish time (a few
    * vertices per scene — off the pixel hot path by design). Returns
    * struct(lat, lon). */
  val utmToWgs84Udf = udf { (e: Double, n: Double, zone: Int, north: Boolean) =>
    utmToWgs84(e, n, zone, north)
  }

  def utmToWgs84Col(easting: Column, northing: Column, zone: Column, north: Column): Column =
    utmToWgs84Udf(easting, northing, zone, north)
}
