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

  test("CRS parse + transform composition 3857 <-> UTM routes through 4326") {
    assert(Proj.parse("EPSG:4326") === Proj.LonLat)
    assert(Proj.parse("epsg:3857") === Proj.WebMercator)
    assert(Proj.parse("EPSG:32633") === Proj.Utm(33, south = false))
    assert(Proj.parse("EPSG:32733") === Proj.Utm(33, south = true))
    intercept[IllegalArgumentException](Proj.parse("EPSG:27700"))
    val (mx, my) = Proj.transform(15.5, 47.1, Proj.LonLat, Proj.WebMercator)
    val (ue, un) = Proj.transform(mx, my, Proj.WebMercator, Proj.Utm(33, south = false))
    val (lon, lat) = Proj.transform(ue, un, Proj.Utm(33, south = false), Proj.LonLat)
    assert(math.abs(lon - 15.5) < 1e-9 && math.abs(lat - 47.1) < 1e-9)
  }
}
