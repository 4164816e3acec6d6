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
  * - EPSG:2154 / 3034 / 3978 (Lambert conformal conic national grids on
  *   GRS80 — Snyder 1987 §15 closed forms)
  * - EPSG:27700 (OSGB36 / British National Grid: generalized Krüger TM on
  *   Airy 1830 + 7-parameter Helmert datum shift, OS public constants, ~5 m
  *   country-wide — OSTN correction grids are a native-proj feature)
  * - EPSG:2056 (CH1903+ / LV95: Swiss oblique conformal cylindrical exact
  *   closed forms on Bessel 1841 + CH1903 translation, Swisstopo public
  *   constants, ~1-2 m — the CHENyx06 grid is a native-proj feature)
  * - EPSG:5070 (NAD83 / Conus Albers equal-area conic — Snyder 1987 §14)
  * - EPSG:3395 (WGS84 World Mercator — ellipsoidal Mercator, Snyder 1987 §7,
  *   variants A (+k) and B (+lat_ts))
  * - EPSG:3413 / 3031 (NSIDC Arctic / Antarctic polar stereographic —
  *   Snyder 1987 §21, variants A and B; the standard polar-raster grids)
  * - EPSG:28992 (Amersfoort / RD New — oblique stereographic on the
  *   conformal sphere, EPSG method 9809, Bessel 1841 + Amersfoort Helmert)
  * - EPSG:5513 / 5514 (S-JTSK / Krovak — oblique conformal conic, EPSG
  *   method 9819, Bessel 1841 + the standard 589/76/480 Helmert; the
  *   Czech/Slovak national grids)
  * - raw proj4 parameter strings (`+proj=tmerc/lcc/aea/somerc/sterea/krovak/
  *   utm/merc/stere(polar)/longlat/webmerc` with +ellps/+a/+rf/+datum,
  *   optional +pm, and optional +towgs84 Helmert), parsed onto the same engines — the breadth path for
  *   CRSs without a named preset (the reference accepts any proj4 CRS,
  *   `vectortile/package.scala:28-39`)
  *
  * All transforms route through 4326, so any supported pair composes.
  */
object Proj {

  // WGS84
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563

  /** per-(zone, hemisphere) UTM instance of the generalized Krüger TM */
  private val utmCache = new java.util.concurrent.ConcurrentHashMap[Integer, KruegerTm]()
  private def utmTm(zone: Int, south: Boolean): KruegerTm =
    utmCache.computeIfAbsent(Integer.valueOf(zone * 2 + (if (south) 1 else 0)), _ =>
      new KruegerTm(A, 1.0 / F, 0.9996, lat0 = 0.0, lon0 = zone * 6.0 - 183.0,
        fe = 500000.0, fn = if (south) 10000000.0 else 0.0))

  /** (easting, northing) of a lon/lat (degrees) in UTM `zone`; `south` picks
    * the 10000 km false northing. Delegates to [[KruegerTm]] (one shared
    * implementation of the n^4 series).
    */
  def lonLatToUtm(lon: Double, lat: Double, zone: Int, south: Boolean): (Double, Double) =
    utmTm(zone, south).forward(lon, lat)

  /** Inverse of [[lonLatToUtm]]. */
  def utmToLonLat(e: Double, n: Double, zone: Int, south: Boolean): (Double, Double) =
    utmTm(zone, south).inverse(e, n)

  private def atanh(x: Double): Double = 0.5 * math.log((1.0 + x) / (1.0 - x))

  /** Krüger transverse Mercator over an ARBITRARY ellipsoid + grid origin —
    * the same n^4 series as the UTM path, parameterized for national grids
    * (e.g. Airy 1830 + the OSGB true origin at 49N 2W). Geodetic coordinates
    * are in the grid's own datum; datum shifts are layered on top
    * ([[Helmert]]).
    */
  final case class KruegerTm(a: Double, invF: Double, k0: Double,
      lat0: Double, lon0: Double, fe: Double, fn: Double) extends PlaneProjection {
    private val f = 1.0 / invF
    private val n = f / (2.0 - f)
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    private val aRect = a / (1.0 + n) * (1.0 + n2 / 4.0 + n2 * n2 / 64.0)
    private val alpha = Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 5.0 * n3 / 16.0 + 41.0 * n4 / 180.0,
      13.0 * n2 / 48.0 - 3.0 * n3 / 5.0 + 557.0 * n4 / 1440.0,
      61.0 * n3 / 240.0 - 103.0 * n4 / 140.0,
      49561.0 * n4 / 161280.0)
    private val beta = Array(
      n / 2.0 - 2.0 * n2 / 3.0 + 37.0 * n3 / 96.0 - n4 / 360.0,
      n2 / 48.0 + n3 / 15.0 - 437.0 * n4 / 1440.0,
      17.0 * n3 / 480.0 - 37.0 * n4 / 840.0,
      4397.0 * n4 / 161280.0)
    private val delta = Array(
      2.0 * n - 2.0 * n2 / 3.0 - 2.0 * n3 + 116.0 * n4 / 45.0,
      7.0 * n2 / 3.0 - 8.0 * n3 / 5.0 - 227.0 * n4 / 45.0,
      56.0 * n3 / 15.0 - 136.0 * n4 / 35.0,
      4279.0 * n4 / 630.0)
    private val c = 2.0 * math.sqrt(n) / (1.0 + n)

    private def xiEta(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val dLam = math.toRadians(lon) - math.toRadians(lon0)
      val sinPhi = math.sin(phi)
      val t = math.sinh(atanh(sinPhi) - c * atanh(c * sinPhi))
      val xiP = math.atan2(t, math.cos(dLam))
      val etaP = atanh(math.sin(dLam) / math.sqrt(1.0 + t * t))
      var xi = xiP; var eta = etaP
      var j = 1
      while (j <= 4) {
        xi += alpha(j - 1) * math.sin(2.0 * j * xiP) * math.cosh(2.0 * j * etaP)
        eta += alpha(j - 1) * math.cos(2.0 * j * xiP) * math.sinh(2.0 * j * etaP)
        j += 1
      }
      (xi, eta)
    }
    /** northing of the grid's latitude-of-origin on the central meridian */
    private val m0 = k0 * aRect * xiEta(lon0, lat0)._1

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val (xi, eta) = xiEta(lon, lat)
      (fe + k0 * aRect * eta, fn + k0 * aRect * xi - m0)
    }

    def inverse(e: Double, nth: Double): (Double, Double) = {
      val xi0 = (nth - fn + m0) / (k0 * aRect)
      val eta0 = (e - fe) / (k0 * aRect)
      var xiP = xi0; var etaP = eta0
      var j = 1
      while (j <= 4) {
        xiP -= beta(j - 1) * math.sin(2.0 * j * xi0) * math.cosh(2.0 * j * eta0)
        etaP -= beta(j - 1) * math.cos(2.0 * j * xi0) * math.sinh(2.0 * j * eta0)
        j += 1
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      var phi = chi
      j = 1
      while (j <= 4) { phi += delta(j - 1) * math.sin(2.0 * j * chi); j += 1 }
      val lam = math.toRadians(lon0) + math.atan2(math.sinh(etaP), math.cos(xiP))
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** 7-parameter Helmert datum shift (position-vector convention, small-angle
    * rotation matrix; rotations in arc-seconds, scale in ppm). `inverse` is
    * the standard negated-parameter approximation.
    */
  final case class Helmert(tx: Double, ty: Double, tz: Double,
      rxSec: Double, rySec: Double, rzSec: Double, ppm: Double) {
    private val rx = math.toRadians(rxSec / 3600.0)
    private val ry = math.toRadians(rySec / 3600.0)
    private val rz = math.toRadians(rzSec / 3600.0)
    private val s = 1.0 + ppm * 1e-6
    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) = (
      tx + s * (x - rz * y + ry * z),
      ty + s * (rz * x + y - rx * z),
      tz + s * (-ry * x + rx * y + z))
    def inverse: Helmert = Helmert(-tx, -ty, -tz, -rxSec, -rySec, -rzSec, -ppm)
  }

  /** geodetic (degrees) -> earth-centred cartesian on an ellipsoid (h = 0) */
  def geodeticToCart(lon: Double, lat: Double, a: Double, invF: Double): (Double, Double, Double) = {
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val phi = math.toRadians(lat); val lam = math.toRadians(lon)
    val nu = a / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
    (nu * math.cos(phi) * math.cos(lam),
      nu * math.cos(phi) * math.sin(lam),
      nu * (1.0 - e2) * math.sin(phi))
  }

  /** cartesian -> geodetic (degrees), iterative latitude (h discarded) */
  def cartToGeodetic(x: Double, y: Double, z: Double, a: Double, invF: Double): (Double, Double) = {
    val f = 1.0 / invF
    val e2 = f * (2.0 - f)
    val lam = math.atan2(y, x)
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1.0 - e2))
    var i = 0
    while (i < 10) {
      val nu = a / math.sqrt(1.0 - e2 * math.sin(phi) * math.sin(phi))
      val h = p / math.cos(phi) - nu
      phi = math.atan2(z, p * (1.0 - e2 * nu / (nu + h)))
      i += 1
    }
    (math.toDegrees(lam), math.toDegrees(phi))
  }

  // Airy 1830 (OSGB36): a, b = 6377563.396, 6356256.909
  private val AiryA = 6377563.396
  private val AiryInvF = AiryA / (AiryA - 6356256.909)
  /** OSGB national grid TM: k0, true origin 49N 2W, FE/FN 400000/-100000. */
  private[geom] val OsgbTm = new KruegerTm(AiryA, AiryInvF, 0.9996012717,
    lat0 = 49.0, lon0 = -2.0, fe = 400000.0, fn = -100000.0)
  /** WGS84 -> OSGB36 Helmert (OS "Guide to coordinate systems", ~5 m single
    * transformation for the whole country; OSTN grids are a native-proj
    * feature by design).
    */
  private[geom] val Wgs84ToOsgb36 = Helmert(-446.448, 125.157, -542.060,
    -0.1502, -0.2470, -0.8421, 20.4894)

  /** Oblique conformal cylindrical ("swiss oblique mercator", proj4
    * `somerc`) parameterized over its natural origin, scale, and ellipsoid
    * (Swisstopo "Formulas and constants for the calculation of the Swiss
    * conformal cylindrical projection" — public): ellipsoid -> conformal
    * sphere at the origin -> rotation to the origin pseudo-equator ->
    * Mercator. Exact closed forms, not the series approximation. Geodetic
    * input/output in the grid's own datum.
    */
  final case class Somerc(
      lat0Deg: Double, lon0Deg: Double, k0: Double,
      fe: Double, fn: Double,
      a: Double, invF: Double) extends PlaneProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sp0 = math.sin(phi0)
    /** radius of the conformal sphere at the origin, scaled by k0 */
    private val bigR = k0 * a * math.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)
    private val alpha = math.sqrt(1.0 + (e2 / (1.0 - e2)) * math.pow(math.cos(phi0), 4))
    private val b0 = math.asin(sp0 / alpha)
    private val bigK = math.log(math.tan(math.Pi / 4 + b0 / 2)) -
      alpha * math.log(math.tan(math.Pi / 4 + phi0 / 2)) +
      alpha * e / 2 * math.log((1 + e * sp0) / (1 - e * sp0))
    private val FE = fe
    private val FN = fn

    /** local geodetic (degrees) -> grid (E, N). */
    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
      val sp = math.sin(phi)
      // conformal latitude on the sphere
      val b = 2.0 * (math.atan(math.exp(
        alpha * math.log(math.tan(math.Pi / 4 + phi / 2)) -
          alpha * e / 2 * math.log((1 + e * sp) / (1 - e * sp)) + bigK)) - math.Pi / 4)
      val l = alpha * (lam - lam0)
      // rotate to the pseudo-equator through Bern
      val lBar = math.atan2(math.sin(l), math.sin(b0) * math.tan(b) + math.cos(b0) * math.cos(l))
      val bBar = math.asin(math.cos(b0) * math.sin(b) - math.sin(b0) * math.cos(b) * math.cos(l))
      (FE + bigR * lBar, FN + bigR * math.log(math.tan(math.Pi / 4 + bBar / 2)))
    }

    /** grid (E, N) -> local geodetic (degrees). */
    def inverse(eN: Double, nN: Double): (Double, Double) = {
      val lBar = (eN - FE) / bigR
      val bBar = 2.0 * (math.atan(math.exp((nN - FN) / bigR)) - math.Pi / 4)
      val b = math.asin(math.cos(b0) * math.sin(bBar) + math.sin(b0) * math.cos(bBar) * math.cos(lBar))
      val l = math.atan2(math.sin(lBar),
        math.cos(b0) * math.cos(lBar) - math.sin(b0) * math.tan(bBar))
      val lam = lam0 + l / alpha
      // invert the conformal-latitude map by fixed point (quadratic convergence)
      var phi = b
      var i = 0
      while (i < 12) {
        val sp = math.sin(phi)
        phi = 2.0 * (math.atan(math.exp(
          (math.log(math.tan(math.Pi / 4 + b / 2)) - bigK) / alpha +
            e / 2 * math.log((1 + e * sp) / (1 - e * sp)))) - math.Pi / 4)
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** The Bern-anchored LV95 instance (EPSG:2056 projection parameters). */
  val SwissGrid: Somerc = Somerc(
    lat0Deg = 46.0 + 57.0 / 60 + 8.66 / 3600, lon0Deg = 7.0 + 26.0 / 60 + 22.50 / 3600,
    k0 = 1.0, fe = 2600000.0, fn = 1200000.0,
    a = 6377397.155, invF = 299.1528128)

  /** CH1903/Bessel -> WGS84 3-parameter shift (Swisstopo public constants,
    * ~1-2 m; the centimetre path is swisstopo's CHENyx06 grid, a native-proj
    * feature).
    */
  private[geom] val Ch1903ToWgs84 = Helmert(674.374, 15.056, 405.346, 0, 0, 0, 0)
  private[geom] val BesselA = 6377397.155
  private[geom] val BesselInvF = 299.1528128

  /** A plane projection on its own datum's geodetic coordinates (degrees). */
  trait PlaneProjection {
    def forward(lon: Double, lat: Double): (Double, Double)
    def inverse(x: Double, y: Double): (Double, Double)
  }

  sealed trait Crs
  case object LonLat extends Crs
  case object WebMercator extends Crs
  final case class Utm(zone: Int, south: Boolean) extends Crs

  /** A CRS assembled from proj4-style parameters: any [[PlaneProjection]] on
    * an arbitrary ellipsoid, plus an optional `+towgs84` Helmert (applied in
    * the proj4 convention: local datum -> WGS84). Without a shift the lon/lat
    * hub is treated as datum-equivalent (GRS80-family datums sit within
    * centimetres of WGS84).
    */
  final case class Proj4Crs(proj: PlaneProjection, a: Double, invF: Double,
      toWgs84: Option[Helmert]) extends Crs
  /** EPSG:27700 — OSGB36 / British National Grid (Airy 1830 TM + Helmert
    * datum shift to/from the WGS84 hub).
    */
  case object BritishNationalGrid extends Crs
  /** EPSG:2056 — CH1903+ / LV95 (Swiss oblique conformal cylindrical on
    * Bessel 1841 + CH1903 translation to/from the WGS84 hub).
    */
  case object SwissLv95 extends Crs

  /** Lambert conformal conic, 2SP (ellipsoidal closed forms — Snyder 1987
    * §15 / EPSG guidance note 7-2). Angles in degrees; `a`/`invF` default to
    * GRS80 (the ellipsoid of the ETRS89/RGF93/NAD83 national grids). The
    * lon/lat hub is treated as datum-agnostic: GRS80-based datums differ from
    * WGS84 at the centimetre level, below tiling/geocoding resolution (a
    * datum-shift grid is a native-proj feature by design).
    */
  final case class Lcc(
      lat0: Double, lat1: Double, lat2: Double, lon0: Double,
      fe: Double, fn: Double,
      a: Double = 6378137.0, invF: Double = 298.257222101,
      k0: Double = 1.0) extends Crs with PlaneProjection {
    private val f = 1.0 / invF
    private val e = math.sqrt(f * (2.0 - f))
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - e * e * s * s)
    }
    private def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
    }
    private val phi0 = math.toRadians(lat0)
    private val phi1 = math.toRadians(lat1)
    private val phi2 = math.toRadians(lat2)
    /** cone constant; 1SP degenerate case n = sin(phi1) */
    private val nC =
      if (math.abs(phi1 - phi2) < 1e-12) math.sin(phi1)
      else (math.log(m(phi1)) - math.log(m(phi2))) / (math.log(tOf(phi1)) - math.log(tOf(phi2)))
    require(math.abs(nC) > 1e-12,
      s"degenerate LCC cone constant (standard parallels $lat1/$lat2 symmetric about the equator)")
    private val fC = m(phi1) / (nC * math.pow(tOf(phi1), nC))
    // the 1SP scale factor multiplies every radius — fold it into the radius
    // used for rho (NOT into scaleAt's denominator, which needs the true a)
    private val aK = a * k0
    private val rho0 = aK * fC * math.pow(tOf(phi0), nC)

    /** point scale factor at latitude `lat` (k0 on the standard parallels) */
    def scaleAt(lat: Double): Double = {
      val phi = math.toRadians(lat)
      nC * aK * fC * math.pow(tOf(phi), nC) / (a * m(phi))
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val rho = aK * fC * math.pow(tOf(math.toRadians(lat)), nC)
      val theta = nC * (math.toRadians(lon) - math.toRadians(lon0))
      (fe + rho * math.sin(theta), fn + rho0 - rho * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val sgn = math.signum(nC)
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val rho = sgn * math.sqrt(dx * dx + dy * dy)
      val t = math.pow(rho / (aK * fC), 1.0 / nC)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val lam = theta / nC + math.toRadians(lon0)
      var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
      var i = 0
      while (i < 8) { // converges quadratically; 8 is belt-and-braces
        val s = math.sin(phi)
        phi = math.Pi / 2.0 -
          2.0 * math.atan(t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** EPSG:2154 — RGF93 / Lambert-93 (France; EPSG registry parameters). */
  val Lambert93: Lcc = Lcc(lat0 = 46.5, lat1 = 49.0, lat2 = 44.0, lon0 = 3.0,
    fe = 700000.0, fn = 6600000.0)
  /** EPSG:3034 — ETRS89-extended / LCC Europe. */
  val LccEurope: Lcc = Lcc(lat0 = 52.0, lat1 = 35.0, lat2 = 65.0, lon0 = 10.0,
    fe = 4000000.0, fn = 2800000.0)
  /** EPSG:3978 — NAD83 / Canada Atlas Lambert. */
  val LccCanada: Lcc = Lcc(lat0 = 49.0, lat1 = 49.0, lat2 = 77.0, lon0 = -95.0,
    fe = 0.0, fn = 0.0)

  /** Albers equal-area conic, 2SP (ellipsoidal closed forms — Snyder 1987
    * §14). The standard grid for US federal rasters (EPSG:5070-class).
    * Angles in degrees; defaults to GRS80 like [[Lcc]]. Independent gate:
    * the Jacobian determinant of (x, y) w.r.t. (lon, lat) must equal the
    * ellipsoidal area element everywhere (equal-area property), checked by
    * finite differences in ProjSpec.
    */
  final case class Aea(
      lat0: Double, lat1: Double, lat2: Double, lon0: Double,
      fe: Double, fn: Double,
      a: Double = 6378137.0, invF: Double = 298.257222101) extends Crs with PlaneProjection {
    require(!invF.isInfinite, "spherical Albers is not supported (ellipsoidal forms divide by e)")
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    }
    /** Snyder 14-12: q(phi), with q(pi/2) = qPolar */
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1.0 - e2) * (s / (1.0 - e2 * s * s) -
        (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
    }
    private val phi0 = math.toRadians(lat0)
    private val phi1 = math.toRadians(lat1)
    private val phi2 = math.toRadians(lat2)
    private val nC =
      if (math.abs(phi1 - phi2) < 1e-12) math.sin(phi1)
      else {
        val m1 = m(phi1); val m2 = m(phi2)
        (m1 * m1 - m2 * m2) / (q(phi2) - q(phi1))
      }
    require(math.abs(nC) > 1e-12,
      s"degenerate Albers cone constant (standard parallels $lat1/$lat2 symmetric about the equator)")
    private val bigC = m(phi1) * m(phi1) + nC * q(phi1)
    private def rho(phi: Double): Double = a * math.sqrt(bigC - nC * q(phi)) / nC
    private val rho0 = rho(phi0)

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val r = rho(math.toRadians(lat))
      val theta = nC * (math.toRadians(lon) - math.toRadians(lon0))
      (fe + r * math.sin(theta), fn + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val sgn = math.signum(nC)
      val dx = x - fe
      val dy = rho0 - (y - fn)
      val r = sgn * math.sqrt(dx * dx + dy * dy)
      val theta = math.atan2(sgn * dx, sgn * dy)
      val lam = theta / nC + math.toRadians(lon0)
      val qv = (bigC - (r * nC / a) * (r * nC / a)) / nC
      // q(+-pi/2): inputs at/beyond the polar limit short-circuit to the pole
      // instead of dividing by cos(phi) = 0 in the iteration below
      val qPolar = q(math.Pi / 2.0)
      if (math.abs(qv) >= qPolar * (1.0 - 1e-12))
        return (math.toDegrees(lam), if (qv > 0) 90.0 else -90.0)
      // Snyder 3-16 latitude iteration from phi = asin(q/2), clamped away
      // from the poles (the correction divides by cos(phi)), stopping once
      // the update falls below tolerance
      val phiMax = math.Pi / 2.0 - 1e-9
      var phi = math.asin(math.min(1.0, math.max(-1.0, qv / 2.0)))
      var i = 0
      var delta = 1.0
      while (i < 20 && math.abs(delta) > 1e-13) {
        val s = math.sin(phi)
        val onemes2 = 1.0 - e2 * s * s
        delta = onemes2 * onemes2 / (2.0 * math.cos(phi)) * (
          qv / (1.0 - e2) - s / onemes2 +
            (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s)))
        phi = math.min(phiMax, math.max(-phiMax, phi + delta))
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** EPSG:5070 — NAD83 / Conus Albers (EPSG registry parameters). */
  val ConusAlbers: Aea = Aea(lat0 = 23.0, lat1 = 29.5, lat2 = 45.5, lon0 = -96.0,
    fe = 0.0, fn = 0.0)

  /** Ellipsoidal Mercator (Snyder 1987 §7 / EPSG Mercator variants A and B).
    * `k0` is the scale on the equator; a standard parallel (`lat_ts`,
    * variant B) is expressed as k0 = m(lat_ts) by the companion builder.
    * The spherical limit (invF infinite) degrades exactly to the classic
    * sphere formulas (e = 0 nulls every correction term).
    */
  final case class Merc(
      lon0: Double, k0: Double, fe: Double, fn: Double,
      a: Double = 6378137.0, invF: Double = 298.257223563) extends Crs with PlaneProjection {
    private val f = if (invF.isInfinite) 0.0 else 1.0 / invF
    private val e = math.sqrt(f * (2.0 - f))

    /** point scale factor at latitude `lat` (k0 on the equator) */
    def scaleAt(lat: Double): Double = {
      val phi = math.toRadians(lat)
      val s = math.sin(phi)
      k0 * math.sqrt(1.0 - e * e * s * s) / math.cos(phi)
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phi = math.toRadians(lat)
      val s = math.sin(phi)
      val y = a * k0 * (math.log(math.tan(math.Pi / 4.0 + phi / 2.0)) -
        (if (e == 0.0) 0.0 else e / 2.0 * math.log((1.0 + e * s) / (1.0 - e * s))))
      (fe + a * k0 * (math.toRadians(lon) - math.toRadians(lon0)), fn + y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val lam = math.toRadians(lon0) + (x - fe) / (a * k0)
      val t = math.exp(-(y - fn) / (a * k0))
      var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
      var i = 0
      while (i < 8) { // quadratic convergence (same iteration as Lcc)
        val s = math.sin(phi)
        phi = math.Pi / 2.0 -
          2.0 * math.atan(t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }
  object Merc {
    /** Variant B: scale 1 on the standard parallels ±latTs. */
    def withStandardParallel(latTs: Double, lon0: Double, fe: Double, fn: Double,
        a: Double = 6378137.0, invF: Double = 298.257223563): Merc = {
      val f = if (invF.isInfinite) 0.0 else 1.0 / invF
      val e2 = f * (2.0 - f)
      val phiTs = math.toRadians(latTs)
      val s = math.sin(phiTs)
      Merc(lon0, math.cos(phiTs) / math.sqrt(1.0 - e2 * s * s), fe, fn, a, invF)
    }
  }

  /** EPSG:3395 — WGS 84 / World Mercator (ellipsoidal, k0 = 1). */
  val WorldMercator: Merc = Merc(lon0 = 0.0, k0 = 1.0, fe = 0.0, fn = 0.0)

  /** Polar stereographic (Snyder 1987 §21 / EPSG Polar Stereographic
    * variants A and B) — the standard projection for polar rasters
    * (EPSG:3413 Arctic, EPSG:3031 Antarctic). `north` picks the aspect; the
    * south aspect evaluates the north forms at (-lat) with the y-axis
    * flipped (Snyder 21-4). Scale is `k0` at the pole (variant A) or 1 on
    * the `latTs` standard parallel (variant B, via the companion builder).
    * Oblique stereographic is out of scope (polar is what polar data uses).
    */
  final case class PolarStereo(
      north: Boolean, lon0: Double, k0: Double, fe: Double, fn: Double,
      a: Double = 6378137.0, invF: Double = 298.257223563) extends Crs with PlaneProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    /** Snyder 15-9 (north-aspect latitude) */
    private def tOf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4.0 - phi / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
    }
    /** rho = 2 a k0 t / sqrt((1+e)^(1+e) (1-e)^(1-e))   (Snyder 21-33) */
    private val rhoF = 2.0 * a * k0 /
      math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e))

    /** point scale factor at latitude `lat` (k0 at the pole) */
    def scaleAt(lat: Double): Double = {
      val phiN = if (north) math.toRadians(lat) else -math.toRadians(lat)
      val s = math.sin(phiN)
      rhoF * tOf(phiN) * math.sqrt(1.0 - e2 * s * s) / (a * math.cos(phiN))
    }

    def forward(lon: Double, lat: Double): (Double, Double) = {
      val phiN = if (north) math.toRadians(lat) else -math.toRadians(lat)
      val dLam = math.toRadians(lon) - math.toRadians(lon0)
      val rho = rhoF * tOf(phiN)
      val x = fe + rho * math.sin(dLam)
      val y = if (north) fn - rho * math.cos(dLam) else fn + rho * math.cos(dLam)
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val dx = x - fe
      val dyN = if (north) -(y - fn) else y - fn
      val rho = math.hypot(dx, dyN)
      val t = rho / rhoF
      var phi = math.Pi / 2.0 - 2.0 * math.atan(t)
      var i = 0
      while (i < 8) {
        val s = math.sin(phi)
        phi = math.Pi / 2.0 -
          2.0 * math.atan(t * math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0))
        i += 1
      }
      val lam = math.toRadians(lon0) + math.atan2(dx, dyN)
      if (north) (math.toDegrees(lam), math.toDegrees(phi))
      else (math.toDegrees(lam), -math.toDegrees(phi))
    }
  }
  object PolarStereo {
    /** Variant B: scale 1 on the `latTs` standard parallel. k0 follows from
      * equating rho at latTs with a*m(latTs) (Snyder 21-32 vs 21-34).
      */
    def withStandardParallel(latTs: Double, lon0: Double, fe: Double, fn: Double,
        a: Double = 6378137.0, invF: Double = 298.257223563): PolarStereo = {
      val north = latTs >= 0.0
      val f = 1.0 / invF
      val e2 = f * (2.0 - f)
      val e = math.sqrt(e2)
      val phiTs = math.toRadians(math.abs(latTs))
      val s = math.sin(phiTs)
      val mTs = math.cos(phiTs) / math.sqrt(1.0 - e2 * s * s)
      val tTs = math.tan(math.Pi / 4.0 - phiTs / 2.0) /
        math.pow((1.0 - e * s) / (1.0 + e * s), e / 2.0)
      val k0 = mTs * math.sqrt(math.pow(1.0 + e, 1.0 + e) * math.pow(1.0 - e, 1.0 - e)) /
        (2.0 * tTs)
      PolarStereo(north, lon0, k0, fe, fn, a, invF)
    }
  }

  /** EPSG:3413 — WGS 84 / NSIDC Sea Ice Polar Stereographic North. */
  val ArcticPolarStereo: PolarStereo =
    PolarStereo.withStandardParallel(latTs = 70.0, lon0 = -45.0, fe = 0.0, fn = 0.0)
  /** EPSG:3031 — WGS 84 / Antarctic Polar Stereographic. */
  val AntarcticPolarStereo: PolarStereo =
    PolarStereo.withStandardParallel(latTs = -71.0, lon0 = 0.0, fe = 0.0, fn = 0.0)

  /** Oblique (and equatorial) stereographic, EPSG method 9809 — the
    * conformal-sphere ("double stereographic") formulation national grids
    * like Amersfoort / RD New (EPSG:28992) are DEFINED on (a Gauss-Schreiber
    * conformal sphere at the origin, then sphere stereographic; this is NOT
    * the same surface as Snyder's direct ellipsoidal oblique stereographic —
    * coordinates differ by metres away from the origin). Geodetic
    * input/output in the grid's own datum; datum shifts layer via
    * [[Proj4Crs]]/[[Helmert]].
    */
  final case class ObliqueStereo(
      lat0Deg: Double, lon0Deg: Double, k0: Double,
      fe: Double, fn: Double,
      a: Double, invF: Double) extends Crs with PlaneProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val phi0 = math.toRadians(lat0Deg)
    private val lam0 = math.toRadians(lon0Deg)
    private val sp0 = math.sin(phi0)
    /** conformal-sphere radius at the origin: sqrt(rho0 nu0) */
    private val bigR = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sp0 * sp0)
    private val n = math.sqrt(1.0 + e2 * math.pow(math.cos(phi0), 4) / (1.0 - e2))
    private val w1 = math.pow(
      (1.0 + sp0) / (1.0 - sp0) * math.pow((1.0 - e * sp0) / (1.0 + e * sp0), e), n)
    private val chi0Prov = math.asin((w1 - 1.0) / (w1 + 1.0))
    private val cC = (n + sp0) * (1.0 - math.sin(chi0Prov)) /
      ((n - sp0) * (1.0 + math.sin(chi0Prov)))
    private val w2 = cC * w1
    private val chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    private val sinChi0 = math.sin(chi0)
    private val cosChi0 = math.cos(chi0)

    private def chiOf(phi: Double): Double = {
      val sp = math.sin(phi)
      val w = cC * math.pow(
        (1.0 + sp) / (1.0 - sp) * math.pow((1.0 - e * sp) / (1.0 + e * sp), e), n)
      math.asin((w - 1.0) / (w + 1.0))
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val chi = chiOf(math.toRadians(latDeg))
      val dLam = n * (math.toRadians(lonDeg) - lam0)
      val sinChi = math.sin(chi); val cosChi = math.cos(chi)
      val b = 1.0 + sinChi * sinChi0 + cosChi * cosChi0 * math.cos(dLam)
      (fe + 2.0 * bigR * k0 * cosChi * math.sin(dLam) / b,
        fn + 2.0 * bigR * k0 * (sinChi * cosChi0 - cosChi * sinChi0 * math.cos(dLam)) / b)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val eP = x - fe; val nP = y - fn
      val g = 2.0 * bigR * k0 * math.tan(math.Pi / 4.0 - chi0 / 2.0)
      val h = 4.0 * bigR * k0 * math.tan(chi0) + g
      val i = math.atan2(eP, h + nP)
      val j = math.atan2(eP, g - nP) - i
      val chi = chi0 + 2.0 * math.atan((nP - eP * math.tan(j / 2.0)) / (2.0 * bigR * k0))
      val dLam = j + 2.0 * i
      val lam = dLam / n + lam0
      // invert the conformal map: psi target from chi, then Newton-ish
      // iteration on the isometric latitude (EPSG GN7-2 recipe)
      val psi0 = 0.5 * math.log((1.0 + math.sin(chi)) / (cC * (1.0 - math.sin(chi)))) / n
      var phi = 2.0 * math.atan(math.exp(psi0)) - math.Pi / 2.0
      var it = 0
      var diff = 1.0
      while (it < 12 && math.abs(diff) > 1e-15) {
        val sp = math.sin(phi)
        val psi = math.log(math.tan(phi / 2.0 + math.Pi / 4.0) *
          math.pow((1.0 - e * sp) / (1.0 + e * sp), e / 2.0))
        diff = (psi - psi0) * math.cos(phi) * (1.0 - e2 * sp * sp) / (1.0 - e2)
        phi -= diff
        it += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** EPSG:28992 — Amersfoort / RD New (Bessel 1841; EPSG registry
    * parameters). The Amersfoort->WGS84 Helmert is applied on the hub side
    * (EPSG 15934-class transformation, ~0.5 m without the NTv2 grid).
    */
  private[geom] val RdNewProj = ObliqueStereo(
    lat0Deg = 52.0 + 9.0 / 60 + 22.178 / 3600,
    lon0Deg = 5.0 + 23.0 / 60 + 15.5 / 3600,
    k0 = 0.9999079, fe = 155000.0, fn = 463000.0,
    a = BesselA, invF = BesselInvF)
  private[geom] val AmersfoortToWgs84 = Helmert(
    565.417, 50.3319, 465.552, -0.398957, 0.343988, -1.87740, 4.0725)
  /** EPSG:28992 as a routed CRS (projection + datum shift). */
  val RdNew: Crs = Proj4Crs(RdNewProj, BesselA, BesselInvF, Some(AmersfoortToWgs84))

  /** Krovak oblique conformal conic (EPSG method 9819, Guidance Note 7-2
    * formulas) — the projection under the Czech/Slovak S-JTSK national
    * grids (EPSG:5513 positive southing/westing, EPSG:5514 east/north).
    * Three conformal stages: Gaussian conformal latitude on the sphere at
    * the projection centre, spherical rotation to the oblique pole (cone
    * axis at azimuth `alphaCDeg`), then a one-parallel conformal cone at
    * the pseudo-standard parallel `latPDeg`.
    *
    * `lon0Deg` is GREENWICH-referenced: the registry labels the longitude
    * of origin "24°50' E of Ferro", but the GN7-2 worked example evaluates
    * V = B(λO − λ) with λ from Greenwich and λO = 24°50' (i.e. the cone
    * axis at 42°30' E of Ferro) — this engine reproduces that example to
    * 1 cm (ProjSpec) and therefore matches PROJ's bare `+lon_0=24.8333`
    * strings directly. `eastNorth=true` negates southing/westing into the
    * EPSG:5514 axes (Czech coordinates come out negative by design).
    */
  final case class Krovak(
      latCDeg: Double, lon0Deg: Double, alphaCDeg: Double, latPDeg: Double,
      kP: Double, fe: Double, fn: Double, a: Double, invF: Double,
      eastNorth: Boolean) extends Crs with PlaneProjection {
    private val f = 1.0 / invF
    private val e2 = f * (2.0 - f)
    private val e = math.sqrt(e2)
    private val phiC = math.toRadians(latCDeg)
    private val lam0 = math.toRadians(lon0Deg)
    private val alphaC = math.toRadians(alphaCDeg)
    private val phiP = math.toRadians(latPDeg)
    private val sinC = math.sin(phiC)
    /** Gaussian sphere radius at the centre: a sqrt(1−e²)/(1−e² sin²φC). */
    private val bigA = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sinC * sinC)
    private val bigB = math.sqrt(1.0 + e2 * math.pow(math.cos(phiC), 4) / (1.0 - e2))
    private[geom] val gamma0 = math.asin(sinC / bigB)
    private[geom] val t0 = math.tan(math.Pi / 4 + gamma0 / 2) *
      math.pow((1.0 + e * sinC) / (1.0 - e * sinC), e * bigB / 2) /
      math.pow(math.tan(math.Pi / 4 + phiC / 2), bigB)
    private val n = math.sin(phiP)
    private val r0 = kP * bigA / math.tan(phiP)
    private val tanPn = math.pow(math.tan(math.Pi / 4 + phiP / 2), n)

    /** Gaussian (conformal-sphere) latitude of geodetic latitude `phi`. */
    private[geom] def gaussLat(phi: Double): Double = {
      val sp = math.sin(phi)
      2.0 * (math.atan(t0 * math.pow(math.tan(phi / 2 + math.Pi / 4), bigB) /
        math.pow((1.0 + e * sp) / (1.0 - e * sp), e * bigB / 2)) - math.Pi / 4)
    }

    /** Rotation to the oblique pole: (U, V) gaussian lat/lon -> (T, D).
      * GN7-2 publishes D = asin(cos U sin V / cos T), which loses the
      * quadrant once the point passes the oblique pole's meridian plane;
      * the atan2 form below is identical inside the S-JTSK domain (the
      * ProjSpec 3D-rotation gate proves it) and correct everywhere. */
    private[geom] def rotate(u: Double, v: Double): (Double, Double) = {
      val t = math.asin(math.cos(alphaC) * math.sin(u) +
        math.sin(alphaC) * math.cos(u) * math.cos(v))
      val d = math.atan2(math.cos(u) * math.sin(v),
        math.cos(alphaC) * math.cos(u) * math.cos(v) - math.sin(alphaC) * math.sin(u))
      (t, d)
    }

    def forward(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val u = gaussLat(math.toRadians(latDeg))
      val v = bigB * (lam0 - math.toRadians(lonDeg))
      val (t, d) = rotate(u, v)
      val theta = n * d
      val r = r0 * tanPn / math.pow(math.tan(t / 2 + math.Pi / 4), n)
      val xp = r * math.cos(theta) // southing
      val yp = r * math.sin(theta) // westing
      if (eastNorth) (-yp + fe, -xp + fn) else (xp + fe, yp + fn)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val (xp, yp) = if (eastNorth) (fn - y, fe - x) else (x - fe, y - fn)
      val r = math.hypot(xp, yp)
      val theta = math.atan2(yp, xp)
      val d = theta / n
      val t = 2.0 * (math.atan(math.pow(r0 / r, 1.0 / n) *
        math.tan(math.Pi / 4 + phiP / 2)) - math.Pi / 4)
      val u = math.asin(math.cos(alphaC) * math.sin(t) -
        math.sin(alphaC) * math.cos(t) * math.cos(d))
      val v = math.atan2(math.cos(t) * math.sin(d),
        math.cos(alphaC) * math.cos(t) * math.cos(d) + math.sin(alphaC) * math.sin(t))
      val lam = lam0 - v / bigB
      // invert the gaussian latitude by fixed-point iteration (GN7-2 recipe)
      var phi = u
      var it = 0
      var diff = 1.0
      while (it < 15 && math.abs(diff) > 1e-14) {
        val sp = math.sin(phi)
        val next = 2.0 * (math.atan(math.pow(t0, -1.0 / bigB) *
          math.pow(math.tan(u / 2 + math.Pi / 4), 1.0 / bigB) *
          math.pow((1.0 + e * sp) / (1.0 - e * sp), e / 2)) - math.Pi / 4)
        diff = next - phi
        phi = next
        it += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** The S-JTSK Krovak instance (Bessel 1841; EPSG registry parameters). */
  private[geom] def SJtskKrovak(eastNorth: Boolean): Krovak = Krovak(
    latCDeg = 49.5, lon0Deg = 24.0 + 50.0 / 60, // cone axis 42°30' E of Ferro
    alphaCDeg = 30.0 + 17.0 / 60 + 17.3031 / 3600,
    latPDeg = 78.5, kP = 0.9999, fe = 0.0, fn = 0.0,
    a = BesselA, invF = BesselInvF, eastNorth = eastNorth)
  /** S-JTSK -> WGS84 (the standard 3-parameter `+towgs84=589,76,480`). */
  private[geom] val SJtskToWgs84 = Helmert(589.0, 76.0, 480.0, 0, 0, 0, 0)
  /** EPSG:5514 — S-JTSK / Krovak East North (Czechia + Slovakia). */
  val SJtsk5514: Crs =
    Proj4Crs(SJtskKrovak(eastNorth = true), BesselA, BesselInvF, Some(SJtskToWgs84))
  /** EPSG:5513 — S-JTSK / Krovak (positive southing X, westing Y). */
  val SJtsk5513: Crs =
    Proj4Crs(SJtskKrovak(eastNorth = false), BesselA, BesselInvF, Some(SJtskToWgs84))

  // ---- proj4-string front-end --------------------------------------------

  /** Named ellipsoids a proj4 string can reference (public proj data). */
  private val Ellipsoids: Map[String, (Double, Double)] = Map(
    "wgs84" -> (6378137.0, 298.257223563),
    "grs80" -> (6378137.0, 298.257222101),
    "airy" -> (AiryA, AiryInvF),
    "bessel" -> (BesselA, BesselInvF),
    "intl" -> (6378388.0, 297.0),
    "clrk66" -> (6378206.4, 294.978698213898),
    "sphere" -> (6370997.0, Double.PositiveInfinity))

  /** Parse a raw proj4 parameter string (`+proj=... +lat_1=... ...`) into a
    * [[Crs]] over the existing projection engines: `longlat`, `merc`/
    * `webmerc` (spherical web mercator), `utm`, `tmerc` (generalized Krüger),
    * `lcc` (1/2SP), `aea` (Albers). Ellipsoid from `+ellps`/`+datum` or
    * explicit `+a` + `+rf`/`+b`; an optional `+towgs84` (3 or 7 parameters,
    * proj4 position-vector convention local->WGS84) layers a Helmert datum
    * shift. `+pm` (named or numeric prime meridian) shifts `+lon_0` to its
    * Greenwich equivalent — the geodetic hub of this engine is always
    * Greenwich lon/lat. Unsupported: grid-file datums (+nadgrids),
    * projections outside the list above.
    */
  def parseProj4(s: String): Crs = {
    val kv: Map[String, String] = s.trim.split("\\s+").toSeq
      .filter(_.startsWith("+"))
      .map(_.drop(1))
      .map { tok =>
        tok.split("=", 2) match {
          case Array(k, v) => k.toLowerCase -> v
          case Array(k) => k.toLowerCase -> ""
        }
      }.toMap
    def num(k: String, dflt: Double): Double =
      kv.get(k).map(_.toDouble).getOrElse(dflt)
    // prime meridian: degrees to ADD to a +pm-referenced longitude to get
    // its Greenwich value (ferro is 17°40' WEST of Greenwich)
    val pmShift = kv.get("pm").map {
      case "greenwich" => 0.0
      case "ferro" => -(17.0 + 40.0 / 60)
      case v => v.toDouble
    }.getOrElse(0.0)
    def lon0(dflt: Double): Double = num("lon_0", dflt) + pmShift
    val (ea, eInvF) = {
      val named = kv.get("ellps").orElse(kv.get("datum")).map(_.toLowerCase)
        .map(n => Ellipsoids.getOrElse(n match { case "nad83" | "etrs89" => "grs80"; case other => other },
          throw new IllegalArgumentException(s"unsupported ellipsoid/datum '$n'")))
      named.getOrElse {
        kv.get("a").map(_.toDouble) match {
          case Some(a0) =>
            val invF = kv.get("rf").map(_.toDouble).getOrElse {
              val b = kv.get("b").map(_.toDouble).getOrElse(a0)
              if (b == a0) Double.PositiveInfinity else a0 / (a0 - b)
            }
            (a0, invF)
          case None => Ellipsoids("wgs84")
        }
      }
    }
    val toWgs: Option[Helmert] = kv.get("towgs84")
      .map(_.split(",").map(_.trim.toDouble))
      .flatMap {
        case Array(0, 0, 0) => None
        case Array(tx, ty, tz) => Some(Helmert(tx, ty, tz, 0, 0, 0, 0))
        case Array(tx, ty, tz, rx, ry, rz, ppm) => Some(Helmert(tx, ty, tz, rx, ry, rz, ppm))
        case other => throw new IllegalArgumentException(
          s"+towgs84 needs 3 or 7 parameters, got ${other.length}")
      }
    val k0 = num("k", num("k_0", 1.0))
    kv.getOrElse("proj", throw new IllegalArgumentException(s"missing +proj in '$s'")) match {
      case "longlat" | "latlong" | "latlon" | "lonlat" =>
        require(toWgs.isEmpty, "datum-shifted longlat is not a plane CRS this engine targets")
        LonLat
      case "webmerc" => WebMercator
      case "merc" if kv.get("a").contains("6378137") && kv.get("b").contains("6378137") &&
          !Seq("lat_ts", "k", "k_0", "x_0", "y_0", "lon_0", "pm").exists(kv.contains) =>
        // the spherical web-mercator spelling — only when no parameter would
        // be discarded; otherwise fall through to the general merc engine
        // (Merc degrades exactly to the sphere when invF is infinite)
        WebMercator
      case "merc" =>
        // general (ellipsoidal) Mercator: +lat_ts (variant B) wins over +k
        val m = kv.get("lat_ts").map(_.toDouble) match {
          case Some(ts) => Merc.withStandardParallel(ts, lon0(0),
            num("x_0", 0), num("y_0", 0), ea, eInvF)
          case None => Merc(lon0(0), k0, num("x_0", 0), num("y_0", 0), ea, eInvF)
        }
        if (toWgs.isEmpty) m else Proj4Crs(m, ea, eInvF, toWgs)
      case "stere" =>
        val lat0 = num("lat_0", 90.0)
        require(math.abs(math.abs(lat0) - 90.0) < 1e-9,
          s"+proj=stere is supported in the polar aspect only (+lat_0=+-90, got $lat0)")
        val north = lat0 > 0
        val p = kv.get("lat_ts").map(_.toDouble) match {
          case Some(ts) =>
            require((ts >= 0) == north, s"+lat_ts=$ts contradicts +lat_0=$lat0")
            PolarStereo.withStandardParallel(ts, lon0(0),
              num("x_0", 0), num("y_0", 0), ea, eInvF)
          case None => PolarStereo(north, lon0(0), k0,
            num("x_0", 0), num("y_0", 0), ea, eInvF)
        }
        if (toWgs.isEmpty) p else Proj4Crs(p, ea, eInvF, toWgs)
      case "utm" =>
        val z = kv.getOrElse("zone",
          throw new IllegalArgumentException("+proj=utm needs +zone")).toInt
        require(z >= 1 && z <= 60, s"UTM zone $z out of [1,60]")
        val south = kv.contains("south")
        // the bare Utm engine is WGS84: a non-WGS84 ellipsoid or a datum
        // shift (ED50-style UTM codes) must route through the parameterized
        // path or coordinates would silently be ~100 m off
        if (toWgs.isEmpty && (ea, eInvF) == Ellipsoids("wgs84")) Utm(z, south)
        else Proj4Crs(KruegerTm(ea, eInvF, 0.9996,
          lat0 = 0.0, lon0 = z * 6.0 - 183.0,
          fe = 500000.0, fn = if (south) 10000000.0 else 0.0), ea, eInvF, toWgs)
      case "tmerc" =>
        Proj4Crs(KruegerTm(ea, eInvF, k0,
          lat0 = num("lat_0", 0), lon0 = lon0(0),
          fe = num("x_0", 0), fn = num("y_0", 0)), ea, eInvF, toWgs)
      case "lcc" =>
        val lat1 = num("lat_1", num("lat_0", 0))
        Proj4Crs(Lcc(lat0 = num("lat_0", lat1), lat1 = lat1, lat2 = num("lat_2", lat1),
          lon0 = lon0(0), fe = num("x_0", 0), fn = num("y_0", 0),
          a = ea, invF = eInvF, k0 = k0), ea, eInvF, toWgs)
      case "somerc" =>
        Proj4Crs(Somerc(lat0Deg = num("lat_0", 0), lon0Deg = lon0(0), k0 = k0,
          fe = num("x_0", 0), fn = num("y_0", 0), a = ea, invF = eInvF), ea, eInvF, toWgs)
      case "sterea" => // oblique stereographic, conformal-sphere (EPSG 9809)
        Proj4Crs(ObliqueStereo(lat0Deg = num("lat_0", 0), lon0Deg = lon0(0),
          k0 = k0, fe = num("x_0", 0), fn = num("y_0", 0), a = ea, invF = eInvF),
          ea, eInvF, toWgs)
      case "krovak" =>
        // PROJ semantics: bare +lon_0 is already the Greenwich-effective
        // longitude of origin (default 24°50' = 42°30' E of Ferro); the
        // historical `+pm=ferro +lon_0=42.5` spelling shifts to the same
        // value through pmShift. +czech flips to positive southing/westing
        // (EPSG:5513 axes); the default matches PROJ's east/north output.
        val k = Krovak(
          latCDeg = num("lat_0", 49.5), lon0Deg = lon0(24.0 + 50.0 / 60),
          alphaCDeg = num("alpha", 30.0 + 17.0 / 60 + 17.3031 / 3600),
          latPDeg = num("lat_1", 78.5), kP = k0,
          fe = num("x_0", 0), fn = num("y_0", 0), a = ea, invF = eInvF,
          eastNorth = !kv.contains("czech"))
        if (toWgs.isEmpty) k else Proj4Crs(k, ea, eInvF, toWgs)
      case "aea" =>
        require(k0 == 1.0, "+proj=aea does not take a scale factor (+k/+k_0)")
        val lat1 = num("lat_1", num("lat_0", 0))
        Proj4Crs(Aea(lat0 = num("lat_0", lat1), lat1 = lat1, lat2 = num("lat_2", lat1),
          lon0 = lon0(0), fe = num("x_0", 0), fn = num("y_0", 0),
          a = ea, invF = eInvF), ea, eInvF, toWgs)
      case other => throw new IllegalArgumentException(
        s"unsupported +proj=$other (supported: longlat, webmerc, merc, " +
          "utm, tmerc, lcc, aea, somerc, sterea, krovak, stere-polar)")
    }
  }

  private val UtmRe = "(?i)epsg:(32[67])(\\d{2})".r

  /** Parse a CRS spec: an EPSG code (4326, 3857, 326xx/327xx UTM, 2154/3034/
    * 3978 LCC national grids, 5070 Conus Albers, 27700 OSGB, 2056 LV95) or a
    * raw proj4 parameter string (`+proj=...` — see [[parseProj4]]).
    */
  def parse(code: String): Crs = {
    val t = code.trim
    if (t.startsWith("+")) parseProj4(t)
    else t.toLowerCase match {
      case "epsg:4326" | "4326" => LonLat
      case "epsg:3857" | "3857" | "epsg:900913" => WebMercator
      case "epsg:2154" | "2154" => Lambert93
      case "epsg:3034" | "3034" => LccEurope
      case "epsg:3978" | "3978" => LccCanada
      case "epsg:5070" | "5070" => ConusAlbers
      case "epsg:3395" | "3395" => WorldMercator
      case "epsg:3413" | "3413" => ArcticPolarStereo
      case "epsg:3031" | "3031" => AntarcticPolarStereo
      case "epsg:27700" | "27700" => BritishNationalGrid
      case "epsg:2056" | "2056" => SwissLv95
      case "epsg:28992" | "28992" => RdNew
      case "epsg:5514" | "5514" => SJtsk5514
      case "epsg:5513" | "5513" => SJtsk5513
      case UtmRe(series, zone) =>
        val z = zone.toInt
        require(z >= 1 && z <= 60, s"UTM zone $z out of [1,60]")
        Utm(z, south = series == "327")
      case other => throw new IllegalArgumentException(
        s"unsupported CRS '$other' (supported: EPSG:4326, EPSG:3857, " +
          "EPSG:326xx/327xx, EPSG:2154/3034/3978, EPSG:5070, EPSG:3395, " +
          "EPSG:3413, EPSG:3031, EPSG:27700, EPSG:2056, EPSG:28992, " +
          "EPSG:5513/5514, or a raw +proj=... string)")
    }
  }

  /** Point transform `from` -> `to`, routed through lon/lat. */
  def transform(x: Double, y: Double, from: Crs, to: Crs): (Double, Double) = {
    val (lon, lat) = from match {
      case LonLat => (x, y)
      case WebMercator => (TileMath.mercXToLon(x), TileMath.mercYToLat(y))
      case Utm(z, s) => utmToLonLat(x, y, z, s)
      case l: Lcc => l.inverse(x, y)
      case al: Aea => al.inverse(x, y)
      case m: Merc => m.inverse(x, y)
      case p: PolarStereo => p.inverse(x, y)
      case o: ObliqueStereo => o.inverse(x, y)
      case k: Krovak => k.inverse(x, y)
      case Proj4Crs(proj, pa, pInvF, shift) =>
        val (lonD, latD) = proj.inverse(x, y)
        shift match {
          case None => (lonD, latD)
          case Some(h) =>
            val (cx, cy, cz) = geodeticToCart(lonD, latD, pa, pInvF)
            val (wx, wy, wz) = h(cx, cy, cz)
            cartToGeodetic(wx, wy, wz, A, 1.0 / F)
        }
      case BritishNationalGrid =>
        val (lonO, latO) = OsgbTm.inverse(x, y) // OSGB36 geodetic
        val (cx, cy, cz) = geodeticToCart(lonO, latO, AiryA, AiryInvF)
        val (wx, wy, wz) = Wgs84ToOsgb36.inverse(cx, cy, cz)
        cartToGeodetic(wx, wy, wz, A, 1.0 / F)
      case SwissLv95 =>
        val (lonC, latC) = SwissGrid.inverse(x, y) // CH1903 geodetic
        val (cx, cy, cz) = geodeticToCart(lonC, latC, BesselA, BesselInvF)
        val (wx, wy, wz) = Ch1903ToWgs84(cx, cy, cz)
        cartToGeodetic(wx, wy, wz, A, 1.0 / F)
    }
    to match {
      case LonLat => (lon, lat)
      case WebMercator => (TileMath.lonToMercX(lon), TileMath.latToMercY(lat))
      case Utm(z, s) => lonLatToUtm(lon, lat, z, s)
      case l: Lcc => l.forward(lon, lat)
      case al: Aea => al.forward(lon, lat)
      case m: Merc => m.forward(lon, lat)
      case p: PolarStereo => p.forward(lon, lat)
      case o: ObliqueStereo => o.forward(lon, lat)
      case k: Krovak => k.forward(lon, lat)
      case Proj4Crs(proj, pa, pInvF, shift) =>
        shift match {
          case None => proj.forward(lon, lat)
          case Some(h) =>
            val (cx, cy, cz) = geodeticToCart(lon, lat, A, 1.0 / F)
            val (lx, ly, lz) = h.inverse(cx, cy, cz)
            val (lonD, latD) = cartToGeodetic(lx, ly, lz, pa, pInvF)
            proj.forward(lonD, latD)
        }
      case BritishNationalGrid =>
        val (cx, cy, cz) = geodeticToCart(lon, lat, A, 1.0 / F)
        val (ox, oy, oz) = Wgs84ToOsgb36(cx, cy, cz)
        val (lonO, latO) = cartToGeodetic(ox, oy, oz, AiryA, AiryInvF)
        OsgbTm.forward(lonO, latO)
      case SwissLv95 =>
        val (cx, cy, cz) = geodeticToCart(lon, lat, A, 1.0 / F)
        val (sx, sy, sz) = Ch1903ToWgs84.inverse(cx, cy, cz)
        val (lonC, latC) = cartToGeodetic(sx, sy, sz, BesselA, BesselInvF)
        SwissGrid.forward(lonC, latC)
    }
  }
}
