package vps.kernels

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom._
import vps.geom.{Geo, Wkt}

class KernelSpec extends AnyFunSuite {
  private def line(pts: (Double, Double)*): LineString =
    Geo.factory.createLineString(pts.map { case (x, y) => new Coordinate(x, y) }.toArray)

  // ---- Segments ----

  test("connect chains segments forward and reversed") {
    val segs = Seq(line((0, 0), (1, 0)), line((2, 0), (1, 0)), line((2, 0), (3, 0)))
    val out = Segments.connectLines(segs)
    assert(out.size === 1)
    assert(out.head.getCoordinates.map(c => (c.x, c.y)).toSeq ===
      Seq((0.0, 0.0), (1.0, 0.0), (2.0, 0.0), (3.0, 0.0)))
  }

  test("connect leaves unconnectable chains separate") {
    val segs = Seq(line((0, 0), (1, 0)), line((5, 5), (6, 6)))
    assert(Segments.connectLines(segs).size === 2)
  }

  test("formRings closes a square from shuffled segments") {
    val segs = Seq(
      line((0, 0), (1, 0)), line((1, 1), (0, 1)), // will need chaining
      line((1, 0), (1, 1)), line((0, 1), (0, 0)))
    val rings = Segments.formRingPolygons(segs.map(_.asInstanceOf[LineString]))
    assert(rings.size === 1)
    assert(rings.head.isValid)
    assert(rings.head.getArea === 1.0)
  }

  test("formRings throws on open chains") {
    val segs = Seq(line((0, 0), (1, 0)), line((1, 0), (2, 2)))
    assertThrows[Segments.AssemblyException] {
      Segments.formRings(segs.map(_.getCoordinates))
    }
  }

  // ---- WayAssembly ----

  test("way assembly family rules") {
    assert(WayAssembly.assemble(Seq.empty, isArea = false).getGeometryType === "LineString")
    assert(WayAssembly.assemble(Seq.empty, isArea = false).isEmpty)
    assert(WayAssembly.assemble(Seq((1.0, 2.0)), isArea = false).getGeometryType === "Point")
    assert(WayAssembly.assemble(Seq((0.0, 0.0), (1.0, 1.0)), isArea = true).getGeometryType === "LineString")
    val sq = Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 0.0))
    assert(WayAssembly.assemble(sq, isArea = true).getGeometryType === "Polygon")
    assert(WayAssembly.assemble(sq, isArea = false).getGeometryType === "LineString")
    assert(WayAssembly.assemble(Seq((0.0, 0.0), (Double.NaN, 1.0)), isArea = false) === null)
    // self-intersecting closed area -> invalid -> null
    val bowtie = Seq((0.0, 0.0), (2.0, 2.0), (2.0, 0.0), (0.0, 2.0), (0.0, 0.0))
    assert(WayAssembly.assemble(bowtie, isArea = true) === null)
  }

  // ---- Routes ----

  test("route build groups by role and stitches") {
    val r = RelationAssembly.buildRoute(
      types = Seq(2, 2, 2),
      roles = Seq("forward", "forward", "backward"),
      geoms = Seq(line((0, 0), (1, 0)), line((1, 0), (2, 0)), line((9, 9), (8, 8))))
    assert(r.isDefined)
    val m = r.get.toMap
    assert(m("forward").getGeometryType === "LineString")
    assert(m("forward").getNumPoints === 3)
    assert(m("backward").getGeometryType === "LineString")
  }

  test("route build bails on missing way geometry") {
    assert(RelationAssembly.buildRoute(Seq(2, 2), Seq("", ""), Seq(line((0, 0), (1, 0)), null)) === None)
    assert(RelationAssembly.buildRoute(Seq.empty, Seq.empty, Seq.empty) === None)
  }

  // ---- Clip (dimension-preservation table, reference Clipping.scala rules) ----

  private val env = new Envelope(0, 10, 0, 10)

  test("clip: point passes through") {
    val p = Geo.point(5, 5)
    assert(Clip(p, env) eq p)
  }

  test("clip: line straddling extent is cut, dimension preserved") {
    val l = line((-5, 5), (15, 5))
    val c = Clip(l, env)
    assert(c.getGeometryType === "LineString")
    assert(c.getEnvelopeInternal.getMinX === 0.0 && c.getEnvelopeInternal.getMaxX === 10.0)
  }

  test("clip: line re-entering produces MultiLineString") {
    val l = line((-5, 2), (5, 2), (5, -2), (8, -2), (8, 2), (15, 2))
    val c = Clip(l, env)
    assert(c.getGeometryType === "MultiLineString")
    assert(c.getNumGeometries === 2)
  }

  test("clip: line touching boundary at a point yields empty MultiLineString") {
    val touch = line((0, 20), (20, 0)) // intersects the box only at corner (10,10)
    val c = Clip(touch, env)
    assert(c.getGeometryType === "MultiLineString" && c.isEmpty)
  }

  test("clip: polygon straddling is cut; sliver touch collapses to empty MultiPolygon") {
    val p = Geo.box(-5, 2, 5, 8)
    val c = Clip(p, env)
    assert(c.getGeometryType === "Polygon")
    assert(c.getEnvelopeInternal.getMinX === 0.0)
    // polygon touching only along an edge -> line intersection -> empty MultiPolygon
    val edge = Geo.box(-5, 0, 0, 10)
    val ce = Clip(edge, env)
    assert(ce.getGeometryType === "MultiPolygon" && ce.isEmpty)
  }

  test("clip: disjoint geometry passes through unchanged (reference behavior)") {
    val far = Geo.box(100, 100, 110, 110)
    assert(Clip(far, env) eq far)
  }

  test("clip: multipolygon split across extent keeps areal parts") {
    val mp = Geo.factory.createMultiPolygon(Array(Geo.box(2, 2, 4, 4), Geo.box(8, 8, 15, 15)))
    val c = Clip(mp, env)
    assert(c.getGeometryType === "MultiPolygon")
    assert(c.getNumGeometries === 2)
    assert(c.getEnvelopeInternal.getMaxX === 10.0)
  }

  // ---- Simplify ----

  test("simplify: DP with tolerance 0 is identity on valid lines") {
    val l = line((0, 0), (1, 0.001), (2, 0), (3, 5), (4, 0))
    assert(Simplify.douglasPeucker(l, 0.0).equalsExact(l))
  }

  test("simplify: collinear vertices removed, topology preserved for rings") {
    val l = line((0, 0), (1, 0), (2, 0), (3, 0))
    val s = Simplify.douglasPeucker(l, 0.01)
    assert(s.getNumPoints === 2)
    val ring = Wkt.read("POLYGON ((0 0, 4 0.01, 8 0, 8 8, 0 8, 0 0))")
    val ts = Simplify.topologyPreserving(ring, 0.1).asInstanceOf[Polygon]
    assert(ts.isValid)
    assert(ts.getNumPoints < ring.getNumPoints)
  }

  test("simplify: zoom tolerance shrinks with zoom") {
    assert(Simplify.toleranceForZoom(14) < Simplify.toleranceForZoom(8))
    assert(Simplify.toleranceForZoom(8) === 360.0 / 256 / 4096)
  }
}
