package vps.geom

/** Closed-form coordinate reprojection between the CRSs a tiling/geocoding
  * pipeline actually meets, with no native proj dependency (offline build):
  *
  * - EPSG:4326 (WGS84 lon/lat degrees)
  * - EPSG:3857 (spherical web mercator — the reference's default target,
  *   `vectortile/package.scala:28-39`)
  * - EPSG:326xx / 327xx (WGS84 UTM zone xx north/south) via the Krüger series
  *   (Karney 2011, "Transverse Mercator with an accuracy of a few nanometers")
  *   truncated at n^4 — micrometer-level inside a UTM zone.
  *
  * All transforms route through 4326, so any supported pair composes.
  */
object Proj {

  // WGS84
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val N = F / (2.0 - F)
  private val N2 = N * N
  private val N3 = N2 * N
  /** rectifying radius */
  private val Arect = A / (1.0 + N) * (1.0 + N2 / 4.0 + N2 * N2 / 64.0)
  private val K0 = 0.9996
  private val FalseEasting = 500000.0
  private val FalseNorthingSouth = 10000000.0

  private val N4 = N3 * N

  // Krueger series to n^4 (Karney 2011, eqs. 35/36/filed expansions) — ~um
  // accuracy across a UTM zone
  private val Alpha = Array(
    N / 2.0 - 2.0 * N2 / 3.0 + 5.0 * N3 / 16.0 + 41.0 * N4 / 180.0,
    13.0 * N2 / 48.0 - 3.0 * N3 / 5.0 + 557.0 * N4 / 1440.0,
    61.0 * N3 / 240.0 - 103.0 * N4 / 140.0,
    49561.0 * N4 / 161280.0)
  private val Beta = Array(
    N / 2.0 - 2.0 * N2 / 3.0 + 37.0 * N3 / 96.0 - N4 / 360.0,
    N2 / 48.0 + N3 / 15.0 - 437.0 * N4 / 1440.0,
    17.0 * N3 / 480.0 - 37.0 * N4 / 840.0,
    4397.0 * N4 / 161280.0)
  private val Delta = Array(
    2.0 * N - 2.0 * N2 / 3.0 - 2.0 * N3 + 116.0 * N4 / 45.0,
    7.0 * N2 / 3.0 - 8.0 * N3 / 5.0 - 227.0 * N4 / 45.0,
    56.0 * N3 / 15.0 - 136.0 * N4 / 35.0,
    4279.0 * N4 / 630.0)

  /** (easting, northing) of a lon/lat (degrees) in UTM `zone`; `south` picks
    * the 10000 km false northing.
    */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lam0 = math.toRadians(zone * 6.0 - 183.0)
    val phi = math.toRadians(lat)
    val dLam = math.toRadians(lon) - lam0
    val sinPhi = math.sin(phi)
    val c = 2.0 * math.sqrt(N) / (1.0 + N)
    val t = math.sinh(atanh(sinPhi) - c * atanh(c * sinPhi))
    val xiP = math.atan2(t, math.cos(dLam))
    val etaP = atanh(math.sin(dLam) / math.sqrt(1.0 + t * t))
    var xi = xiP
    var eta = etaP
    var j = 1
    while (j <= 4) {
      xi += Alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
      eta += Alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
      j += 1
    }
    val e = FalseEasting + K0 * Arect * eta
    val n = (if (south) FalseNorthingSouth else 0.0) + K0 * Arect * xi
    (e, n)
  }

  /** Inverse of [[lonLatToUtm]]. */
  def utmToLonLat(e: Double, n: Double, zone: Int, south: Boolean): (Double, Double) = {
    val lam0 = math.toRadians(zone * 6.0 - 183.0)
    val xi0 = (n - (if (south) FalseNorthingSouth else 0.0)) / (K0 * Arect)
    val eta0 = (e - FalseEasting) / (K0 * Arect)
    var xiP = xi0
    var etaP = eta0
    var j = 1
    while (j <= 4) {
      xiP -= Beta(j - 1) * math.sin(2.0 * j * xi0) * math.cosh(2.0 * j * eta0)
      etaP -= Beta(j - 1) * math.cos(2.0 * j * xi0) * math.sinh(2.0 * j * eta0)
      j += 1
    }
    val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
    var phi = chi
    j = 1
    while (j <= 4) {
      phi += Delta(j - 1) * math.sin(2.0 * j * chi)
      j += 1
    }
    val lam = lam0 + math.atan2(math.sinh(etaP), math.cos(xiP))
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  sealed trait Crs
  case object LonLat extends Crs
  case object WebMercator extends Crs
  final case class Utm(zone: Int, south: Boolean) extends Crs

  private val UtmRe = "(?i)epsg:(32[67])(\\d{2})".r

  /** Parse an EPSG code: 4326, 3857, 326xx/327xx (UTM). */
  def parse(code: String): Crs = code.trim.toLowerCase match {
    case "epsg:4326" | "4326" => LonLat
    case "epsg:3857" | "3857" | "epsg:900913" => WebMercator
    case UtmRe(series, zone) =>
      val z = zone.toInt
      require(z >= 1 && z <= 60, s"UTM zone $z out of [1,60]")
      Utm(z, south = series == "327")
    case other => throw new IllegalArgumentException(
      s"unsupported CRS '$other' (supported: EPSG:4326, EPSG:3857, EPSG:326xx/327xx)")
  }

  /** Point transform `from` -> `to`, routed through lon/lat. */
  def transform(x: Double, y: Double, from: Crs, to: Crs): (Double, Double) = {
    val (lon, lat) = from match {
      case LonLat => (x, y)
      case WebMercator => (TileMath.mercXToLon(x), TileMath.mercYToLat(y))
      case Utm(z, s) => utmToLonLat(x, y, z, s)
    }
    to match {
      case LonLat => (lon, lat)
      case WebMercator => (TileMath.lonToMercX(lon), TileMath.latToMercY(lat))
      case Utm(z, s) => lonLatToUtm(lon, lat, z, s)
    }
  }
}
