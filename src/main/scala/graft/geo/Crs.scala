package graft.geo

/** Hand-implemented CRS transforms (G2, SURVEY.md §2.7): no PROJ offline.
  *
  * Supported SRIDs — exactly the reference's surface:
  *  - 4326   WGS 84 geodetic (lon/lat degrees)
  *  - 3857   Web Mercator (spherical; the reference measures areas here,
  *           load_report.py:319,376)
  *  - 32750  WGS 84 / UTM zone 50S (spatial_analysis_indonesia.r:46-47)
  *  - 100000 custom GPKG srid aliasing UTM 50S (SURVEY.md §7.4)
  *
  * UTM uses the Karney–Krüger series (terms to n⁶, sub-mm accuracy over a
  * UTM zone) on the WGS84 ellipsoid; published in C. F. F. Karney,
  * "Transverse Mercator with an accuracy of a few nanometers" (2011).
  */
object Crs {

  val WGS84 = 4326
  val WebMercator = 3857
  val Utm50S = 32750
  val Utm50SAlias = 100000

  // WGS84 ellipsoid
  private val a = 6378137.0
  private val f = 1.0 / 298.257223563
  private val e2 = f * (2 - f)
  private val e = math.sqrt(e2)

  // third flattening + rectifying radius
  private val n = f / (2 - f)
  private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
  private val n5 = n4 * n; private val n6 = n5 * n
  private val A1 = a / (1 + n) * (1 + n2 / 4 + n4 / 64 + n6 / 256)

  // Krüger series coefficients (Karney 2011, eqs. 35–36)
  private val alpha = Array(
    n / 2 - 2.0 / 3 * n2 + 5.0 / 16 * n3 + 41.0 / 180 * n4 - 127.0 / 288 * n5 + 7891.0 / 37800 * n6,
    13.0 / 48 * n2 - 3.0 / 5 * n3 + 557.0 / 1440 * n4 + 281.0 / 630 * n5 - 1983433.0 / 1935360 * n6,
    61.0 / 240 * n3 - 103.0 / 140 * n4 + 15061.0 / 26880 * n5 + 167603.0 / 181440 * n6,
    49561.0 / 161280 * n4 - 179.0 / 168 * n5 + 6601661.0 / 7257600 * n6,
    34729.0 / 80640 * n5 - 3418889.0 / 1995840 * n6,
    212378941.0 / 319334400 * n6)
  private val beta = Array(
    n / 2 - 2.0 / 3 * n2 + 37.0 / 96 * n3 - 1.0 / 360 * n4 - 81.0 / 512 * n5 + 96199.0 / 604800 * n6,
    1.0 / 48 * n2 + 1.0 / 15 * n3 - 437.0 / 1440 * n4 + 46.0 / 105 * n5 - 1118711.0 / 3870720 * n6,
    17.0 / 480 * n3 - 37.0 / 840 * n4 - 209.0 / 4480 * n5 + 5569.0 / 90720 * n6,
    4397.0 / 161280 * n4 - 11.0 / 504 * n5 - 830251.0 / 7257600 * n6,
    4583.0 / 161280 * n5 - 108847.0 / 3991680 * n6,
    20648693.0 / 638668800 * n6)

  // UTM zone 50S parameters
  private val k0 = 0.9996
  private val lon0_50 = math.toRadians(117.0)
  private val falseEasting = 500000.0
  private val falseNorthingSouth = 10000000.0

  /** Forward transverse Mercator: (lonDeg, latDeg) → (easting, northing). */
  def utm50sForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val phi = math.toRadians(latDeg)
    val lam = math.toRadians(lonDeg) - lon0_50
    val sinPhi = math.sin(phi)
    // conformal latitude via tau' (Karney eq. 7-9)
    val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
    val xiP = math.atan2(t, math.cos(lam))
    val etaP = asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 6) {
      xi += alpha(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
      eta += alpha(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      j += 1
    }
    val x = falseEasting + k0 * A1 * eta
    val y = falseNorthingSouth + k0 * A1 * xi
    (x, y)
  }

  // conformal → geodetic latitude series coefficients (hoisted so the
  // SQL-oracle transcription below interpolates the IDENTICAL doubles
  // utm50sInverse multiplies with)
  private val e4 = e2 * e2; private val e6 = e4 * e2; private val e8 = e6 * e2
  private val chiC2 = e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360
  private val chiC4 = 7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520
  private val chiC6 = 7 * e6 / 120 + 81 * e8 / 1120
  private val chiC8 = 4279 * e8 / 161280

  /** Inverse transverse Mercator: (easting, northing) → (lonDeg, latDeg). */
  def utm50sInverse(x: Double, y: Double): (Double, Double) = {
    val xi = (y - falseNorthingSouth) / (k0 * A1)
    val eta = (x - falseEasting) / (k0 * A1)
    var xiP = xi
    var etaP = eta
    var j = 1
    while (j <= 6) {
      xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
      etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
    // conformal → geodetic latitude (series in e²; ~1e-9 rad accuracy)
    val phi = chi +
      chiC2 * math.sin(2 * chi) +
      chiC4 * math.sin(4 * chi) +
      chiC6 * math.sin(6 * chi) +
      chiC8 * math.sin(8 * chi)
    (math.toDegrees(lam + lon0_50), math.toDegrees(phi))
  }

  /** Constants for SQL-oracle transcriptions of [[utm50sInverse]] /
    * [[webMercatorForward]] (graft-internal): interpolating these exact
    * doubles into oracle SQL keeps the replayed arithmetic on the same
    * values the engine multiplies with. */
  private[graft] def sqlOracleConsts: Map[String, Double] = Map(
    "k0A1" -> k0 * A1,
    "lon0" -> lon0_50,
    "chiC2" -> chiC2, "chiC4" -> chiC4, "chiC6" -> chiC6, "chiC8" -> chiC8,
    "beta1" -> beta(0), "beta2" -> beta(1), "beta3" -> beta(2),
    "beta4" -> beta(3), "beta5" -> beta(4), "beta6" -> beta(5))

  private val R = 6378137.0 // spherical Web-Mercator radius

  def webMercatorForward(lonDeg: Double, latDeg: Double): (Double, Double) = {
    val x = R * math.toRadians(lonDeg)
    val y = R * math.log(math.tan(math.Pi / 4 + math.toRadians(latDeg) / 2))
    (x, y)
  }

  def webMercatorInverse(x: Double, y: Double): (Double, Double) = {
    val lon = math.toDegrees(x / R)
    val lat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
    (lon, lat)
  }

  private def canon(srid: Int): Int = if (srid == Utm50SAlias) Utm50S else srid

  /** Point transform between any two supported SRIDs (composes via 4326). */
  def transform(fromSrid: Int, toSrid: Int): (Double, Double) => (Double, Double) = {
    val from = canon(fromSrid); val to = canon(toSrid)
    if (from == to) (x, y) => (x, y)
    else {
      val toGeo: (Double, Double) => (Double, Double) = from match {
        case WGS84       => (x, y) => (x, y)
        case WebMercator => webMercatorInverse
        case Utm50S      => utm50sInverse
        case s           => throw new IllegalArgumentException(s"unsupported source srid $s")
      }
      val fromGeo: (Double, Double) => (Double, Double) = to match {
        case WGS84       => (x, y) => (x, y)
        case WebMercator => webMercatorForward
        case Utm50S      => (lon, lat) => utm50sForward(lon, lat)
        case s           => throw new IllegalArgumentException(s"unsupported target srid $s")
      }
      (x, y) => { val (lon, lat) = toGeo(x, y); fromGeo(lon, lat) }
    }
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))
}
