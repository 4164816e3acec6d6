package vps.geom

import org.scalatest.funsuite.AnyFunSuite

class ProjSpec extends AnyFunSuite {

  test("UTM anchors: central meridian maps to false easting, equator to N=0") {
    // zone 33 central meridian = 15E
    val (e, n) = Proj.lonLatToUtm(15.0, 0.0, 33, south = false)
    assert(math.abs(e - 500000.0) < 1e-6)
    assert(math.abs(n) < 1e-6)
    // south variant only shifts the false northing
    val (es, ns) = Proj.lonLatToUtm(15.0, -0.0001, 33, south = true)
    val (_, nn) = Proj.lonLatToUtm(15.0, -0.0001, 33, south = false)
    assert(math.abs(es - 500000.0) < 1e-5)
    assert(math.abs(ns - (nn + 10000000.0)) < 1e-6)
  }

  test("UTM northing on the central meridian equals k0 x meridian arc (independent integral)") {
    // meridian radius of curvature M(phi) = a(1-e^2)/(1-e^2 sin^2 phi)^(3/2),
    // integrated numerically — independent of the Krueger series
    val a = 6378137.0
    val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    def m(phi: Double): Double = a * (1 - e2) / math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
    val steps = 200000
    val phiMax = math.toRadians(45.0)
    var arc = 0.0
    var i = 0
    while (i < steps) {
      val p0 = phiMax * i / steps
      val p1 = phiMax * (i + 1) / steps
      arc += (m(p0) + m(p1)) / 2 * (p1 - p0)
      i += 1
    }
    val (_, n) = Proj.lonLatToUtm(15.0, 45.0, 33, south = false)
    assert(math.abs(n - 0.9996 * arc) < 0.01, s"n=$n arc*k0=${0.9996 * arc}")
  }

  test("UTM round trip is exact to sub-mm across the zone") {
    for {
      lon <- Seq(12.1, 13.7, 15.0, 16.3, 17.9)
      lat <- Seq(-79.5, -45.0, -0.3, 0.0, 23.7, 52.5, 83.9)
    } {
      val south = lat < 0
      val (e, n) = Proj.lonLatToUtm(lon, lat, 33, south)
      val (lon2, lat2) = Proj.utmToLonLat(e, n, 33, south)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon,$lat")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lon,$lat")
    }
  }

  test("LCC grid origins: (lon0, lat0) maps exactly to (FE, FN)") {
    // EPSG registry anchors: natural origin of each grid
    val cases = Seq(
      (Proj.Lambert93, 3.0, 46.5, 700000.0, 6600000.0), // EPSG:2154
      (Proj.LccEurope, 10.0, 52.0, 4000000.0, 2800000.0), // EPSG:3034
      (Proj.LccCanada, -95.0, 49.0, 0.0, 0.0)) // EPSG:3978
    cases.foreach { case (crs, lon0, lat0, fe, fn) =>
      val (x, y) = crs.forward(lon0, lat0)
      assert(math.abs(x - fe) < 1e-6 && math.abs(y - fn) < 1e-6, s"$crs origin -> ($x, $y)")
    }
  }

  test("LCC scale factor is 1 on the standard parallels (independent finite-difference check)") {
    val a = 6378137.0
    val f = 1.0 / 298.257222101
    val e2 = f * (2 - f)
    Seq(Proj.Lambert93 -> Seq(49.0, 44.0), Proj.LccEurope -> Seq(35.0, 65.0),
      Proj.LccCanada -> Seq(49.0, 77.0)).foreach { case (crs, parallels) =>
      parallels.foreach { lat =>
        // closed-form k
        assert(math.abs(crs.scaleAt(lat) - 1.0) < 1e-12, s"k(${lat}) for $crs")
        // independent: projected chord along the parallel vs ellipsoidal arc
        // length d = dLam * nu * cos(phi), nu = a / sqrt(1 - e^2 sin^2 phi)
        val phi = math.toRadians(lat)
        val dLam = math.toRadians(1e-4)
        val (x1, y1) = crs.forward(20.0, lat)
        val (x2, y2) = crs.forward(20.0 + 1e-4, lat)
        val chord = math.hypot(x2 - x1, y2 - y1)
        val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
        val arc = dLam * nu * math.cos(phi)
        assert(math.abs(chord / arc - 1.0) < 1e-8, s"finite-diff k at $lat for $crs: ${chord / arc}")
      }
      // and k > 1 outside the parallels, < 1 between them (conic behavior)
      val (lo, hi) = (parallels.min, parallels.max)
      assert(crs.scaleAt((lo + hi) / 2) < 1.0)
      assert(crs.scaleAt(hi + 3.0) > 1.0)
    }
  }

  test("LCC round trips are exact to sub-mm across each grid's domain") {
    def roundTrip(crs: Proj.Lcc, lon: Double, lat: Double): Unit = {
      val (x, y) = crs.forward(lon, lat)
      val (lon2, lat2) = crs.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon,$lat $crs")
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lon,$lat $crs")
    }
    for (lon <- Seq(-4.5, 0.0, 2.35, 5.1, 8.2); lat <- Seq(41.5, 44.0, 46.5, 48.85, 51.0))
      roundTrip(Proj.Lambert93, lon, lat)
    for (lon <- Seq(-10.0, 0.0, 10.0, 25.0); lat <- Seq(35.0, 47.0, 60.0, 70.0))
      roundTrip(Proj.LccEurope, lon, lat)
    for (lon <- Seq(-140.0, -110.0, -95.0, -60.0); lat <- Seq(42.0, 49.0, 63.0, 80.0))
      roundTrip(Proj.LccCanada, lon, lat)
  }

  test("British National Grid: true origin, OS worked example, WGS84 round trip") {
    // true origin (49N 2W, OSGB36 datum) maps exactly to (400000, -100000)
    val (e0, n0) = Proj.OsgbTm.forward(-2.0, 49.0)
    assert(math.abs(e0 - 400000.0) < 1e-6 && math.abs(n0 - (-100000.0)) < 1e-6)
    // OS 'Guide to coordinate systems in Great Britain' worked example
    // (OSGB36 geodetic -> grid): 52d39'27.2531"N 1d43'4.5177"E ->
    // E 651409.903 N 313177.270 (published to mm)
    val lat = 52.0 + 39.0 / 60 + 27.2531 / 3600
    val lon = 1.0 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = Proj.OsgbTm.forward(lon, lat)
    assert(math.abs(e - 651409.903) < 0.01, s"E=$e")
    assert(math.abs(n - 313177.270) < 0.01, s"N=$n")
    // full chain (WGS84 hub + Helmert): round trip to ~cm, shift is ~100 m
    val wgs = Seq((-2.0, 49.0), (0.0, 51.5), (-3.2, 55.95), (-5.9, 54.6))
    wgs.foreach { case (lo, la) =>
      val (ge, gn) = Proj.transform(lo, la, Proj.LonLat, Proj.BritishNationalGrid)
      val (lo2, la2) = Proj.transform(ge, gn, Proj.BritishNationalGrid, Proj.LonLat)
      assert(math.abs(lo2 - lo) < 1e-7 && math.abs(la2 - la) < 1e-7, s"round trip $lo,$la")
    }
    val (ge, gn) = Proj.transform(-2.0, 49.0, Proj.LonLat, Proj.BritishNationalGrid)
    val shift = math.hypot(ge - 400000.0, gn + 100000.0)
    assert(shift > 50 && shift < 300, s"datum shift magnitude $shift m")
    assert(Proj.parse("EPSG:27700") === Proj.BritishNationalGrid)
  }

  test("Swiss LV95: Bern origin, conformality isotropy, WGS84 anchor + round trip") {
    // projection origin (Bern, CH1903 datum) maps exactly to (2600000, 1200000)
    val (e0, n0) = Proj.SwissGrid.forward(
      7.0 + 26.0 / 60 + 22.50 / 3600, 46.0 + 57.0 / 60 + 8.66 / 3600)
    assert(math.abs(e0 - 2600000.0) < 1e-6 && math.abs(n0 - 1200000.0) < 1e-6)
    // conformal => isotropic scale: finite-difference E-W and N-S scale agree
    val aB = 6377397.155; val fB = 1.0 / 299.1528128; val e2B = fB * (2 - fB)
    Seq((7.0, 46.5), (9.5, 47.2), (6.2, 46.2)).foreach { case (lon, lat) =>
      val phi = math.toRadians(lat)
      val d = 1e-5
      val (x0, y0) = Proj.SwissGrid.forward(lon, lat)
      val (x1, y1) = Proj.SwissGrid.forward(lon + d, lat)
      val (x2, y2) = Proj.SwissGrid.forward(lon, lat + d)
      val nu = aB / math.sqrt(1 - e2B * math.sin(phi) * math.sin(phi))
      val m = aB * (1 - e2B) / math.pow(1 - e2B * math.sin(phi) * math.sin(phi), 1.5)
      val kEw = math.hypot(x1 - x0, y1 - y0) / (math.toRadians(d) * nu * math.cos(phi))
      val kNs = math.hypot(x2 - x0, y2 - y0) / (math.toRadians(d) * m)
      assert(math.abs(kEw / kNs - 1.0) < 1e-6, s"anisotropy at $lon,$lat: $kEw vs $kNs")
      // conformal-sphere projection: scale ~1 near the origin parallel
      assert(math.abs(kEw - 1.0) < 2e-3, s"scale at $lon,$lat: $kEw")
    }
    // WGS84 anchor: the published WGS84 position of the Bern origin
    // (7d26'19.08"E 46d57'03.90"N — swisstopo) lands on (2600000, 1200000)
    // within the 3-parameter datum-shift accuracy
    val (be, bn) = Proj.transform(7.0 + 26.0 / 60 + 19.08 / 3600,
      46.0 + 57.0 / 60 + 3.90 / 3600, Proj.LonLat, Proj.SwissLv95)
    assert(math.hypot(be - 2600000.0, bn - 1200000.0) < 10.0,
      s"Bern WGS84 anchor off by ${math.hypot(be - 2600000.0, bn - 1200000.0)} m")
    // full-chain round trips across Switzerland
    for (lon <- Seq(6.1, 7.44, 8.55, 9.8); lat <- Seq(45.9, 46.5, 47.1, 47.7)) {
      val (ge, gn) = Proj.transform(lon, lat, Proj.LonLat, Proj.SwissLv95)
      val (lon2, lat2) = Proj.transform(ge, gn, Proj.SwissLv95, Proj.LonLat)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7, s"round trip $lon,$lat")
    }
    assert(Proj.parse("EPSG:2056") === Proj.SwissLv95)
  }

  test("Albers EPSG:5070: grid origin, equal-area Jacobian, parallel scale, round trips") {
    val al = Proj.ConusAlbers
    // projection origin maps exactly to (FE, FN)
    val (ox, oy) = al.forward(-96.0, 23.0)
    assert(math.abs(ox) < 1e-6 && math.abs(oy) < 1e-6)

    // INDEPENDENT equal-area gate: the Jacobian determinant of (x, y) wrt
    // (lon, lat), by central finite differences, must equal the ellipsoidal
    // area element a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 per radian^2
    val a = 6378137.0
    val e2 = {
      val f = 1.0 / 298.257222101; f * (2 - f)
    }
    val h = 1e-5 // degrees
    for (lon <- Seq(-120.0, -96.0, -75.0); lat <- Seq(25.0, 37.0, 48.0)) {
      // full Jacobian via central differences (deg -> rad)
      def d(p: Double, m: Double) = (p - m) / (2 * h) / math.toRadians(1.0)
      val (xpl, ypl) = al.forward(lon + h, lat); val (xml, yml) = al.forward(lon - h, lat)
      val (xpf, ypf) = al.forward(lon, lat + h); val (xmf, ymf) = al.forward(lon, lat - h)
      val det = d(xpl, xml) * d(ypf, ymf) - d(xpf, xmf) * d(ypl, yml)
      val s = math.sin(math.toRadians(lat))
      val area = a * a * (1 - e2) * math.cos(math.toRadians(lat)) / math.pow(1 - e2 * s * s, 2)
      assert(math.abs(math.abs(det) / area - 1.0) < 1e-6,
        s"area distortion at $lon,$lat: ${math.abs(det) / area}")
    }

    // scale along the standard parallels is 1 (independent finite difference):
    // |dx/dlambda| / (a m(phi)) == 1 at lat_1 and lat_2
    for (lat <- Seq(29.5, 45.5); lon <- Seq(-110.0, -96.0, -80.0)) {
      val (x1, y1) = al.forward(lon - h, lat); val (x2, y2) = al.forward(lon + h, lat)
      val dxdl = math.hypot(x2 - x1, y2 - y1) / (2 * h) / math.toRadians(1.0)
      val s = math.sin(math.toRadians(lat))
      val mphi = math.cos(math.toRadians(lat)) / math.sqrt(1 - e2 * s * s)
      assert(math.abs(dxdl / (a * mphi) - 1.0) < 1e-6, s"parallel scale at $lat")
    }

    // round trips across CONUS, sub-mm
    for (lon <- Seq(-124.0, -105.3, -96.0, -71.1); lat <- Seq(24.5, 33.7, 41.9, 49.0)) {
      val (x, y) = Proj.transform(lon, lat, Proj.LonLat, al)
      val (lon2, lat2) = Proj.transform(x, y, al, Proj.LonLat)
      assert(math.abs(lon2 - lon) < 1e-8 && math.abs(lat2 - lat) < 1e-8, s"round trip $lon,$lat")
    }
    assert(Proj.parse("EPSG:5070") === al)
  }

  test("proj4 strings parse onto the same engines and agree with the presets") {
    // aea spelled as proj4 == the EPSG:5070 preset
    val aea = Proj.parse("+proj=aea +lat_0=23 +lat_1=29.5 +lat_2=45.5 +lon_0=-96 " +
      "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs")
    for (lon <- Seq(-120.0, -84.2); lat <- Seq(28.0, 44.0)) {
      val (x1, y1) = Proj.transform(lon, lat, Proj.LonLat, aea)
      val (x2, y2) = Proj.transform(lon, lat, Proj.LonLat, Proj.ConusAlbers)
      assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
    }
    // lcc spelled as proj4 == Lambert-93
    val lcc = Proj.parse("+proj=lcc +lat_0=46.5 +lat_1=49 +lat_2=44 +lon_0=3 " +
      "+x_0=700000 +y_0=6600000 +ellps=GRS80")
    val (lx, ly) = Proj.transform(2.35, 48.85, Proj.LonLat, lcc)
    val (px, py) = Proj.transform(2.35, 48.85, Proj.LonLat, Proj.Lambert93)
    assert(math.abs(lx - px) < 1e-9 && math.abs(ly - py) < 1e-9)
    // tmerc + towgs84 (official OSGB36 parameters, local->WGS84) == the
    // built-in British National Grid within a millimetre
    val bng = Proj.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 " +
      "+x_0=400000 +y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894")
    for (lon <- Seq(-5.2, -1.54, 0.1); lat <- Seq(50.4, 52.66, 57.1)) {
      val (x1, y1) = Proj.transform(lon, lat, Proj.LonLat, bng)
      val (x2, y2) = Proj.transform(lon, lat, Proj.LonLat, Proj.BritishNationalGrid)
      assert(math.hypot(x1 - x2, y1 - y2) < 1e-3, s"proj4 BNG vs preset at $lon,$lat")
      val (lon2, lat2) = Proj.transform(x1, y1, bng, Proj.LonLat)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }
    // utm + longlat spellings
    assert(Proj.parse("+proj=utm +zone=33 +ellps=WGS84") === Proj.Utm(33, south = false))
    assert(Proj.parse("+proj=utm +zone=19 +south") === Proj.Utm(19, south = true))
    assert(Proj.parse("+proj=longlat +datum=WGS84 +no_defs") === Proj.LonLat)
    intercept[IllegalArgumentException](Proj.parse("+proj=omerc +ellps=bessel"))
    intercept[IllegalArgumentException](Proj.parse("+proj=utm")) // missing zone

    // non-WGS84 UTM (ED50-style) must NOT silently use the WGS84 engine:
    // it routes through the parameterized path, applies the datum shift,
    // and differs from plain WGS84 UTM by the expected ~100-200 m
    val ed50 = Proj.parse("+proj=utm +zone=31 +ellps=intl +towgs84=-87,-98,-121")
    assert(ed50 !== Proj.Utm(31, south = false))
    val (we, wn) = Proj.transform(3.0, 48.0, Proj.LonLat, Proj.Utm(31, south = false))
    val (ee, en) = Proj.transform(3.0, 48.0, Proj.LonLat, ed50)
    val shift = math.hypot(ee - we, en - wn)
    assert(shift > 50 && shift < 400, s"ED50 offset should be ~100-200 m, was $shift")
    val (lonB, latB) = Proj.transform(ee, en, ed50, Proj.LonLat)
    assert(math.abs(lonB - 3.0) < 1e-6 && math.abs(latB - 48.0) < 1e-6)

    // 1SP LCC with a scale factor: k_0 must reach the projection — scale at
    // the natural-origin latitude equals k0 (finite-difference independent)
    val jam = Proj.parse("+proj=lcc +lat_1=18 +lat_0=18 +lon_0=-77 +k_0=0.9996 " +
      "+x_0=250000 +y_0=150000 +ellps=clrk66").asInstanceOf[Proj.Proj4Crs]
    val lccJam = jam.proj.asInstanceOf[Proj.Lcc]
    assert(math.abs(lccJam.scaleAt(18.0) - 0.9996) < 1e-9)
    val (jx, jy) = lccJam.forward(-77.0, 18.0)
    assert(math.abs(jx - 250000.0) < 1e-6 && math.abs(jy - 150000.0) < 1e-6)
    val (jlon, jlat) = lccJam.inverse(jx + 10000, jy - 20000)
    val (jx2, jy2) = lccJam.forward(jlon, jlat)
    assert(math.abs(jx2 - (jx + 10000)) < 1e-6 && math.abs(jy2 - (jy - 20000)) < 1e-6)

    // degenerate cone constants are rejected loudly, not NaN'd silently
    intercept[IllegalArgumentException](Proj.parse("+proj=aea +lon_0=-96 +ellps=GRS80"))
    intercept[IllegalArgumentException](Proj.Aea(0, 29.5, -29.5, -96, 0, 0))
    intercept[IllegalArgumentException](Proj.Lcc(0, 30, -30, 0, 0, 0))

    // somerc spelled as proj4 (the official EPSG:2056 parameter string) ==
    // the built-in Swiss LV95 path, datum shift included
    val lv95 = Proj.parse("+proj=somerc +lat_0=46.95240555555556 " +
      "+lon_0=7.439583333333333 +k_0=1 +x_0=2600000 +y_0=1200000 +ellps=bessel " +
      "+towgs84=674.374,15.056,405.346")
    for (lon <- Seq(6.6, 7.44, 9.5); lat <- Seq(46.2, 47.4)) {
      val (sx, sy) = Proj.transform(lon, lat, Proj.LonLat, Proj.SwissLv95)
      val (px, py) = Proj.transform(lon, lat, Proj.LonLat, lv95)
      assert(math.hypot(sx - px, sy - py) < 1e-4, s"somerc vs LV95 preset at $lon,$lat")
      val (lon2, lat2) = Proj.transform(px, py, lv95, Proj.LonLat)
      assert(math.abs(lon2 - lon) < 1e-7 && math.abs(lat2 - lat) < 1e-7)
    }

    // identity short-circuit works for proj4 CRSs (structural equality incl.
    // the tmerc engine)
    assert(Proj.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
      "+y_0=-100000 +ellps=airy") ===
      Proj.parse("+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
        "+y_0=-100000 +ellps=airy"))
  }

  test("CRS parse + transform composition 3857 <-> UTM routes through 4326") {
    assert(Proj.parse("EPSG:4326") === Proj.LonLat)
    assert(Proj.parse("epsg:3857") === Proj.WebMercator)
    assert(Proj.parse("EPSG:32633") === Proj.Utm(33, south = false))
    assert(Proj.parse("EPSG:32733") === Proj.Utm(33, south = true))
    assert(Proj.parse("EPSG:2154") === Proj.Lambert93)
    assert(Proj.parse("3034") === Proj.LccEurope)
    assert(Proj.parse("epsg:3978") === Proj.LccCanada)
    intercept[IllegalArgumentException](Proj.parse("EPSG:2065")) // Ferro-axis S-JTSK variant: unsupported
    val (mx, my) = Proj.transform(15.5, 47.1, Proj.LonLat, Proj.WebMercator)
    val (ue, un) = Proj.transform(mx, my, Proj.WebMercator, Proj.Utm(33, south = false))
    val (lon, lat) = Proj.transform(ue, un, Proj.Utm(33, south = false), Proj.LonLat)
    assert(math.abs(lon - 15.5) < 1e-9 && math.abs(lat - 47.1) < 1e-9)
    // Lambert-93 <-> UTM 31N composition (both cover central France)
    val (le, ln) = Proj.transform(2.35, 48.85, Proj.LonLat, Proj.Lambert93)
    val (ue2, un2) = Proj.transform(le, ln, Proj.Lambert93, Proj.Utm(31, south = false))
    val (lon2, lat2) = Proj.transform(ue2, un2, Proj.Utm(31, south = false), Proj.LonLat)
    assert(math.abs(lon2 - 2.35) < 1e-9 && math.abs(lat2 - 48.85) < 1e-9)
  }

  /** ellipsoidal parallel arc: dLam x nu x cos(phi) */
  private def parallelArc(lat: Double, dLonDeg: Double, a: Double, invF: Double): Double = {
    val f = 1.0 / invF; val e2 = f * (2 - f)
    val phi = math.toRadians(lat)
    val nu = a / math.sqrt(1 - e2 * math.sin(phi) * math.sin(phi))
    math.toRadians(dLonDeg) * nu * math.cos(phi)
  }
  /** ellipsoidal meridian arc over a small dLat: dPhi x M(phi) */
  private def meridianArc(lat: Double, dLatDeg: Double, a: Double, invF: Double): Double = {
    val f = 1.0 / invF; val e2 = f * (2 - f)
    val phi = math.toRadians(lat)
    math.toRadians(dLatDeg) * a * (1 - e2) /
      math.pow(1 - e2 * math.sin(phi) * math.sin(phi), 1.5)
  }

  test("polar stereographic 3413/3031: parallel scale 1 at lat_ts, pole at origin, conformal, sub-mm round trips") {
    Seq((Proj.ArcticPolarStereo, 70.0), (Proj.AntarcticPolarStereo, -71.0)).foreach {
      case (crs, latTs) =>
        assert(math.abs(crs.scaleAt(latTs) - 1.0) < 1e-12, s"k(lat_ts) for $crs")
        // the pole itself maps to the natural origin (FE, FN) = (0, 0)
        val (px, py) = crs.forward(123.4, if (latTs > 0) 90.0 else -90.0)
        assert(math.abs(px) < 1e-6 && math.abs(py) < 1e-6)
        // independent finite differences: scale along the parallel == scale
        // along the meridian == closed-form scaleAt (conformal + correct k)
        Seq(latTs, if (latTs > 0) 80.0 else -80.0, if (latTs > 0) 62.0 else -62.0).foreach { lat =>
          val sgn = math.signum(lat)
          val (x1, y1) = crs.forward(30.0, lat)
          val (x2, y2) = crs.forward(30.0 + 1e-5, lat)
          val (x3, y3) = crs.forward(30.0, lat + sgn * -1e-5) // step toward the equator
          val kPar = math.hypot(x2 - x1, y2 - y1) / parallelArc(lat, 1e-5, 6378137.0, 298.257223563)
          val kMer = math.hypot(x3 - x1, y3 - y1) / meridianArc(lat, 1e-5, 6378137.0, 298.257223563)
          assert(math.abs(kPar - crs.scaleAt(lat)) < 1e-6, s"kPar($lat)=$kPar vs ${crs.scaleAt(lat)}")
          assert(math.abs(kMer - crs.scaleAt(lat)) < 1e-6, s"kMer($lat)=$kMer vs ${crs.scaleAt(lat)}")
        }
        for (lon <- Seq(-179.0, -45.0, 0.0, 60.0, 179.0); lat <- Seq(60.0, 71.5, 85.0, 89.9)) {
          val la = if (latTs > 0) lat else -lat
          val (x, y) = crs.forward(lon, la)
          val (lon2, lat2) = crs.inverse(x, y)
          assert(math.abs(lat2 - la) < 1e-9, s"lat round trip $lon,$la")
          val lonDiff = (((lon2 - lon) % 360) + 540) % 360 - 180
          assert(math.abs(lonDiff) < 1e-9, s"lon round trip $lon,$la -> $lon2")
        }
    }
  }

  test("polar stereographic EPSG guidance-note anchors (variant B Australian Antarctic, variant A UPS North)") {
    // EPSG GN7-2 Polar Stereographic variant B worked example
    // (WGS 84 / Australian Antarctic Polar Stereographic, EPSG:3032):
    // phi = 75S, lam = 120E -> E 7,255,380.79 / N 7,053,389.56
    val aus = Proj.parse("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=70 " +
      "+x_0=6000000 +y_0=6000000 +ellps=WGS84")
    val (e1, n1) = Proj.transform(120.0, -75.0, Proj.LonLat, aus)
    assert(math.abs(e1 - 7255380.79) < 0.05, s"E=$e1")
    assert(math.abs(n1 - 7053389.56) < 0.05, s"N=$n1")
    // EPSG GN7-2 Polar Stereographic variant A worked example
    // (WGS 84 / UPS North, EPSG:5041): phi = 73N, lam = 44E ->
    // E 3,320,416.75 / N 632,668.43
    val ups = Proj.parse("+proj=stere +lat_0=90 +k=0.994 +lon_0=0 " +
      "+x_0=2000000 +y_0=2000000 +ellps=WGS84")
    val (e2, n2) = Proj.transform(44.0, 73.0, Proj.LonLat, ups)
    assert(math.abs(e2 - 3320416.75) < 0.05, s"E=$e2")
    assert(math.abs(n2 - 632668.43) < 0.05, s"N=$n2")
    // round trip through the parsed CRS
    val (lonB, latB) = Proj.transform(e1, n1, aus, Proj.LonLat)
    assert(math.abs(lonB - 120.0) < 1e-8 && math.abs(latB - -75.0) < 1e-8)
  }

  test("ellipsoidal Mercator (3395): equator scale 1, conformal, round trips, diverges from the sphere") {
    val m = Proj.WorldMercator
    assert(Proj.parse("EPSG:3395") === m)
    assert(math.abs(m.scaleAt(0.0) - 1.0) < 1e-12)
    Seq(0.0, 20.0, 45.0, -65.0).foreach { lat =>
      val (x1, y1) = m.forward(10.0, lat)
      val (x2, y2) = m.forward(10.0 + 1e-5, lat)
      val (x3, y3) = m.forward(10.0, lat + 1e-5)
      val kPar = math.hypot(x2 - x1, y2 - y1) / parallelArc(lat, 1e-5, 6378137.0, 298.257223563)
      val kMer = math.hypot(x3 - x1, y3 - y1) / meridianArc(lat, 1e-5, 6378137.0, 298.257223563)
      assert(math.abs(kPar - m.scaleAt(lat)) < 1e-6 && math.abs(kMer - m.scaleAt(lat)) < 1e-6,
        s"conformality at $lat: $kPar / $kMer vs ${m.scaleAt(lat)}")
    }
    for (lon <- Seq(-179.0, 0.0, 55.5); lat <- Seq(-84.0, -33.3, 0.0, 45.0, 84.0)) {
      val (x, y) = m.forward(lon, lat)
      val (lon2, lat2) = m.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"round trip $lon,$lat")
    }
    // the ellipsoidal northing is smaller than the spherical web-mercator one
    // (known divergence, ~0.3% at mid-latitudes, zero at the equator)
    val (_, y3395) = m.forward(0.0, 45.0)
    val y3857 = TileMath.latToMercY(45.0)
    assert(y3395 < y3857 && y3395 > 0.99 * y3857, s"$y3395 vs $y3857")
  }

  test("Mercator variant B EPSG guidance-note anchor (Caspian Sea, Krassowsky)") {
    // EPSG GN7-2 Mercator variant B worked example (Pulkovo 1942 / Caspian
    // Sea Mercator-style): lat_ts = 42N, lon_0 = 51E, Krassowsky 1940
    // (a = 6378245, 1/f = 298.3); phi = 53N, lam = 53E ->
    // E 165,704.29 / N 5,171,848.07
    val caspian = Proj.parse("+proj=merc +lat_ts=42 +lon_0=51 +a=6378245 +rf=298.3")
    val (e, n) = Proj.transform(53.0, 53.0, Proj.LonLat, caspian)
    assert(math.abs(e - 165704.29) < 0.05, s"E=$e")
    assert(math.abs(n - 5171848.07) < 0.05, s"N=$n")
  }

  test("sphere-Mercator strings with extra parameters route to the general engine, not the webmerc shortcut") {
    // a bare spherical spelling IS web mercator
    assert(Proj.parse("+proj=merc +a=6378137 +b=6378137") === Proj.WebMercator)
    // but +lat_ts / +k / offsets must NOT be silently discarded: the sphere
    // Mercator with a standard parallel scales x and y by cos(lat_ts)
    val ts = Proj.parse("+proj=merc +a=6378137 +b=6378137 +lat_ts=30")
    assert(ts !== Proj.WebMercator)
    val (wx, wy) = Proj.transform(10.0, 45.0, Proj.LonLat, Proj.WebMercator)
    val (sx, sy) = Proj.transform(10.0, 45.0, Proj.LonLat, ts)
    val c = math.cos(math.toRadians(30.0))
    assert(math.abs(sx - wx * c) < 1e-6 && math.abs(sy - wy * c) < 1e-6,
      s"sphere lat_ts=30 should be cos(30)x web mercator: ($sx,$sy) vs (${wx * c},${wy * c})")
    // false offsets shift, scale factor multiplies
    val off = Proj.parse("+proj=merc +a=6378137 +b=6378137 +x_0=500000 +y_0=-1000")
    val (ox, oy) = Proj.transform(10.0, 45.0, Proj.LonLat, off)
    assert(math.abs(ox - (wx + 500000)) < 1e-6 && math.abs(oy - (wy - 1000)) < 1e-6)
    val k = Proj.parse("+proj=merc +a=6378137 +b=6378137 +k=0.5")
    val (kx, ky) = Proj.transform(10.0, 45.0, Proj.LonLat, k)
    assert(math.abs(kx - wx * 0.5) < 1e-6 && math.abs(ky - wy * 0.5) < 1e-6)
  }

  test("RD New (EPSG:28992, oblique stereographic 9809): EPSG worked example, origin, conformality, round trips") {
    // EPSG GN7-2 oblique stereographic worked example (Amersfoort / RD New):
    // phi = 53N, lam = 6E (Amersfoort geodetic) -> E 196,105.283 / N 557,057.739
    val (e1, n1) = Proj.RdNewProj.forward(6.0, 53.0)
    assert(math.abs(e1 - 196105.283) < 0.02, s"E=$e1")
    assert(math.abs(n1 - 557057.739) < 0.02, s"N=$n1")
    // natural origin maps to (FE, FN) and carries scale k0
    val lat0 = 52.0 + 9.0 / 60 + 22.178 / 3600
    val lon0 = 5.0 + 23.0 / 60 + 15.5 / 3600
    val (ox, oy) = Proj.RdNewProj.forward(lon0, lat0)
    assert(math.abs(ox - 155000.0) < 1e-6 && math.abs(oy - 463000.0) < 1e-6)
    // conformality: finite-difference scales along parallel and meridian
    // agree (Bessel ellipsoid arcs), and equal k0 at the origin
    Seq((lon0, lat0, 0.9999079), (6.0, 53.0, -1.0), (4.5, 51.5, -1.0)).foreach {
      case (lon, lat, k0) =>
        val (x1, y1) = Proj.RdNewProj.forward(lon, lat)
        val (x2, y2) = Proj.RdNewProj.forward(lon + 1e-6, lat)
        val (x3, y3) = Proj.RdNewProj.forward(lon, lat + 1e-6)
        val kPar = math.hypot(x2 - x1, y2 - y1) /
          parallelArc(lat, 1e-6, 6377397.155, 299.1528128)
        val kMer = math.hypot(x3 - x1, y3 - y1) /
          meridianArc(lat, 1e-6, 6377397.155, 299.1528128)
        assert(math.abs(kPar - kMer) < 1e-6, s"isotropy at $lon,$lat: $kPar vs $kMer")
        if (k0 > 0) assert(math.abs(kPar - k0) < 1e-6, s"origin scale $kPar")
    }
    // projection-level round trips across the Dutch domain
    for (lon <- Seq(3.5, 5.4, 7.1); lat <- Seq(50.8, 52.2, 53.5)) {
      val (x, y) = Proj.RdNewProj.forward(lon, lat)
      val (lon2, lat2) = Proj.RdNewProj.inverse(x, y)
      assert(math.abs(lon2 - lon) < 1e-9 && math.abs(lat2 - lat) < 1e-9, s"$lon,$lat")
    }
    // routed CRS (datum shift on the hub side): WGS84 round trip + a sane
    // Amersfoort<->WGS84 displacement (tens of metres) at the origin
    val rd = Proj.parse("EPSG:28992")
    val (we, wn) = Proj.transform(lon0, lat0, Proj.LonLat, rd)
    val d = math.hypot(we - 155000.0, wn - 463000.0)
    assert(d > 20 && d < 200, s"datum displacement $d m")
    // 1e-7 deg ~ 1 cm: the Helmert inverse is the standard negated-parameter
    // approximation, second-order (rotation x translation) terms are mm-level
    // at ~1.9 arcsec / 4 ppm
    val (lonB, latB) = Proj.transform(we, wn, rd, Proj.LonLat)
    assert(math.abs(lonB - lon0) < 1e-7 && math.abs(latB - lat0) < 1e-7)
    // proj4 sterea spelling binds to the same engine
    val viaProj4 = Proj.parse("+proj=sterea +lat_0=52.156160555555554 " +
      "+lon_0=5.387638888888889 +k=0.9999079 +x_0=155000 +y_0=463000 +ellps=bessel " +
      "+towgs84=565.417,50.3319,465.552,-0.398957,0.343988,-1.8774,4.0725")
    val (pe, pn) = Proj.transform(5.9, 52.5, Proj.LonLat, viaProj4)
    val (re, rn) = Proj.transform(5.9, 52.5, Proj.LonLat, rd)
    assert(math.abs(pe - re) < 1e-3 && math.abs(pn - rn) < 1e-3)
  }

  test("Krovak (EPSG:5513/5514, method 9819): EPSG worked example, independent rotation gate, conformality, round trips") {
    val k13 = Proj.SJtskKrovak(eastNorth = false)
    // EPSG GN7-2 Krovak worked example: 50°12'32.4416"N, 16°50'59.1790"E
    // (Greenwich) -> X (southing) 1050538.63, Y (westing) 568991.00. The
    // engine's intermediates reproduce the note's published U/V/T chain
    // (U 0.875596949, V 0.139422687, T 1.386275049).
    val lat = 50.0 + 12.0 / 60 + 32.4416 / 3600
    val lon = 16.0 + 50.0 / 60 + 59.1790 / 3600
    val (x13, y13) = k13.forward(lon, lat)
    assert(math.abs(x13 - 1050538.63) < 0.05, s"X=$x13")
    assert(math.abs(y13 - 568991.00) < 0.05, s"Y=$y13")
    // EPSG:5514 (East North) negates southing/westing
    val k14 = Proj.SJtskKrovak(eastNorth = true)
    val (e14, n14) = k14.forward(lon, lat)
    assert(e14 == -y13 && n14 == -x13)
    // INDEPENDENT gate on the oblique-rotation stage: the closed spherical
    // trig must equal a plain 3D rotation of the unit vector about the
    // y-axis by alphaC (computed here from first principles, no shared code)
    val alphaC = math.toRadians(30.0 + 17.0 / 60 + 17.3031 / 3600)
    for (uDeg <- Seq(40.0, 49.5, 60.0); vDeg <- Seq(-8.0, 0.0, 7.0)) {
      val u = math.toRadians(uDeg); val v = math.toRadians(vDeg)
      val p = (math.cos(u) * math.cos(v), math.cos(u) * math.sin(v), math.sin(u))
      val rot = (math.cos(alphaC) * p._1 - math.sin(alphaC) * p._3, p._2,
        math.sin(alphaC) * p._1 + math.cos(alphaC) * p._3)
      val (t, d) = k13.rotate(u, v)
      assert(math.abs(math.sin(t) - rot._3) < 1e-14, s"T at $uDeg,$vDeg")
      assert(math.abs(d - math.atan2(rot._2, rot._1)) < 1e-12, s"D at $uDeg,$vDeg")
    }
    // t0's defining property: the gaussian latitude of the projection
    // centre is exactly gamma0
    assert(math.abs(k13.gaussLat(math.toRadians(49.5)) - k13.gamma0) < 1e-14)
    // conformality: isotropic finite-difference scale over the Czech/Slovak
    // domain, inside the S-JTSK design band (0.9999 on the pseudo-standard
    // parallel to ~1.0001 at the edges)
    for ((lo, la) <- Seq((12.1, 50.2), (14.42, 50.09), (17.0, 49.2), (21.0, 48.7))) {
      val (x1, y1) = k13.forward(lo, la)
      val (x2, y2) = k13.forward(lo + 1e-6, la)
      val (x3, y3) = k13.forward(lo, la + 1e-6)
      val kPar = math.hypot(x2 - x1, y2 - y1) /
        parallelArc(la, 1e-6, 6377397.155, 299.1528128)
      val kMer = math.hypot(x3 - x1, y3 - y1) /
        meridianArc(la, 1e-6, 6377397.155, 299.1528128)
      assert(math.abs(kPar - kMer) < 1e-6, s"isotropy at $lo,$la: $kPar vs $kMer")
      assert(kPar > 0.99985 && kPar < 1.0002, s"scale $kPar at $lo,$la")
    }
    // projection-level round trips across (and a bit beyond) the domain
    for (lo <- Seq(12.2, 15.5, 18.9, 22.4); la <- Seq(47.8, 49.4, 51.0)) {
      val (x, y) = k13.forward(lo, la)
      val (lo2, la2) = k13.inverse(x, y)
      assert(math.abs(lo2 - lo) < 1e-9 && math.abs(la2 - la) < 1e-9, s"$lo,$la")
      val (xe, ye) = k14.forward(lo, la)
      val (lo3, la3) = k14.inverse(xe, ye)
      assert(math.abs(lo3 - lo) < 1e-9 && math.abs(la3 - la) < 1e-9, s"EN $lo,$la")
    }
    // routed CRS: WGS84 -> 5514 (Czech east/north come out negative) and back
    val czk = Proj.parse("EPSG:5514")
    val (we, wn) = Proj.transform(14.42, 50.09, Proj.LonLat, czk) // Prague
    assert(we < -400000 && we > -1000000 && wn < -900000 && wn > -1400000,
      s"implausible 5514 coords $we,$wn")
    val (lonB, latB) = Proj.transform(we, wn, czk, Proj.LonLat)
    assert(math.abs(lonB - 14.42) < 1e-7 && math.abs(latB - 50.09) < 1e-7)
    // 5513 is the negated-axes sibling on the same datum path
    val (sx, sy) = Proj.transform(14.42, 50.09, Proj.LonLat, Proj.parse("5513"))
    assert(math.abs(sx + wn) < 1e-9 && math.abs(sy + we) < 1e-9)
    // the bare-PROJ spelling and the historical +pm=ferro spelling both
    // bind to the same instance (alpha spelled at the EPSG-exact
    // 30°17'17.3031"; PROJ's init files truncate it to ...972222, a 3 mm
    // difference that is PROJ's rounding, not a semantic divergence)
    val viaProj4 = Proj.parse("+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 " +
      "+alpha=30.28813975 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel +towgs84=589,76,480")
    val viaFerro = Proj.parse("+proj=krovak +lat_0=49.5 +lon_0=42.5 +pm=ferro " +
      "+alpha=30.28813975 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel +towgs84=589,76,480")
    for (crs <- Seq(viaProj4, viaFerro)) {
      val (pe, pn) = Proj.transform(14.42, 50.09, Proj.LonLat, crs)
      assert(math.abs(pe - we) < 1e-3 && math.abs(pn - wn) < 1e-3, s"$crs")
    }
    // PROJ's own truncated +alpha spelling still lands within 5 mm
    val viaProjTrunc = Proj.parse("+proj=krovak +lat_0=49.5 +lon_0=24.83333333333333 " +
      "+alpha=30.28813972222222 +k=0.9999 +x_0=0 +y_0=0 +ellps=bessel +towgs84=589,76,480")
    val (te, tn) = Proj.transform(14.42, 50.09, Proj.LonLat, viaProjTrunc)
    assert(math.abs(te - we) < 5e-3 && math.abs(tn - wn) < 5e-3)
  }

  test("Albers inverse is pole-safe (guarded 3-16 iteration)") {
    val crs = Proj.ConusAlbers
    val (xp, yp) = crs.forward(-96.0, 90.0)
    val (lonP, latP) = crs.inverse(xp, yp)
    assert(!latP.isNaN && math.abs(latP - 90.0) < 1e-7, s"pole inverse -> $latP")
    // near-pole round trip converges (the unguarded loop oscillated/NaN'd).
    // q(phi) approaches its polar limit quadratically in cos(phi), so the
    // last ~1e-6 deg before the pole is inherently ill-conditioned — allow
    // ~1 m there, sub-mm elsewhere
    Seq((89.999999, 1e-5), (89.9, 1e-8), (-89.9, 1e-8)).foreach { case (lat, tol) =>
      val (x, y) = crs.forward(-96.0, lat)
      val (_, lat2) = crs.inverse(x, y)
      assert(!lat2.isNaN && math.abs(lat2 - lat) < tol, s"$lat -> $lat2")
    }
  }
}
