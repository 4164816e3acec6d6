package vps.geom

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class GeomSpec extends AnyFunSuite {

  test("WKB round trip") {
    val g = Wkt.read("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
    val back = Wkb.read(Wkb.write(g))
    assert(back.equalsExact(g))
  }

  test("mercator round trip") {
    val rnd = new Random(42)
    (1 to 500).foreach { _ =>
      val lon = rnd.between(-180.0, 180.0)
      val lat = rnd.between(-85.0, 85.0)
      assert(math.abs(TileMath.mercXToLon(TileMath.lonToMercX(lon)) - lon) < 1e-9)
      assert(math.abs(TileMath.mercYToLat(TileMath.latToMercY(lat)) - lat) < 1e-9)
    }
  }

  test("known slippy tiles") {
    // public slippy-map reference values
    assert(TileMath.tileX(0.0, 1) === 1)
    assert(TileMath.tileY(0.0, 1) === 1)
    assert(TileMath.tileX(-180.0, 4) === 0)
    // London (-0.1277, 51.5074) at z=12 -> (2046, 1362)
    assert(TileMath.tileX(-0.1277, 12) === 2046)
    assert(TileMath.tileY(51.5074, 12) === 1362)
  }

  test("tile envelope contains its generating point, keysForEnvelope covers") {
    val rnd = new Random(7)
    (1 to 500).foreach { _ =>
      val lon = rnd.between(-179.9, 179.9)
      val lat = rnd.between(-80.0, 80.0)
      val z = rnd.between(1, 15)
      val x = TileMath.tileX(lon, z)
      val y = TileMath.tileY(lat, z)
      val env = TileMath.tileEnvelopeLatLng(z, x, y)
      assert(env.getMinX - 1e-9 <= lon && lon <= env.getMaxX + 1e-9)
      assert(env.getMinY - 1e-9 <= lat && lat <= env.getMaxY + 1e-9)
      val keys = TileMath.keysForGeometry(Geo.point(lon, lat), z)
      assert(keys.contains((x, y)))
    }
  }

  test("keysForEnvelope on a box spans the expected grid") {
    val g = Geo.box(-1.0, -1.0, 1.0, 1.0)
    val keys = TileMath.keysForGeometry(g, 8)
    assert(keys.toSet === Set((127, 127), (127, 128), (128, 127), (128, 128)))
  }

  test("morton spread/squash inverse") {
    val rnd = new Random(1)
    (1 to 1000).foreach { _ =>
      val v = rnd.nextLong() & ((1L << 29) - 1)
      assert(CellId.squash(CellId.spread(v)) === v)
    }
  }

  test("cell pack/unpack and parent/childRange") {
    val rnd = new Random(2)
    (1 to 500).foreach { _ =>
      val level = rnd.between(2, 21)
      val n = 1L << level
      val x = math.abs(rnd.nextLong()) % n
      val y = math.abs(rnd.nextLong()) % n
      val c = CellId.pack(level, x, y)
      assert(CellId.level(c) === level)
      assert(CellId.x(c) === x)
      assert(CellId.y(c) === y)
      val p = CellId.parent(c, level - 2)
      val (lo, hi) = CellId.childRange(p, level)
      assert(c >= lo && c <= hi)
    }
  }

  test("kRing size and containment") {
    val c = CellId.fromLonLat(10.0, 45.0, 12)
    val ring1 = CellId.kRing(c, 1)
    assert(ring1.size === 9)
    assert(ring1.contains(c))
    val ring2 = CellId.kRing(c, 2)
    assert(ring2.size === 25)
    assert(ring1.toSet.subsetOf(ring2.toSet))
  }

  test("kRing wraps antimeridian and clamps poles") {
    val west = CellId.pack(4, 0, 0) // corner cell
    val ring = CellId.kRing(west, 1)
    // y clamped (no y=-1 row): 2 rows x 3 cols = 6
    assert(ring.size === 6)
    assert(ring.contains(CellId.pack(4, 15, 0))) // x wrapped
  }

  test("kRing dedupes when ring diameter exceeds grid width") {
    // level 1: 2x2 grid; k=2 wraps x multiple times — results must be distinct
    val c = CellId.pack(1, 0, 0)
    val ring = CellId.kRing(c, 2)
    assert(ring.size === ring.distinct.size)
    assert(ring.size === 4) // the whole level-1 grid, once each
  }

  test("z-order locality: children of a cell form contiguous range") {
    val p = CellId.fromLonLat(-0.1, 51.5, 8)
    val (lo, hi) = CellId.childRange(p, 12)
    assert(hi - lo === 255L)
    val px = CellId.x(p); val py = CellId.y(p)
    for (dx <- 0L until 16L; dy <- 0L until 16L) {
      val c = CellId.pack(12, px * 16 + dx, py * 16 + dy)
      assert(c >= lo && c <= hi)
    }
  }
}
