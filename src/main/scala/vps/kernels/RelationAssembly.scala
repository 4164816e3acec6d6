package vps.kernels

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.PreparedGeometryFactory
import vps.geom.Geo

/** OSM relation geometry assembly: multipolygons and routes.
  *
  * Algorithm parity targets (semantics, not code):
  * - multipolygons: `/root/reference/src/main/scala/vectorpipe/relations/MultiPolygons.scala:13-126`
  *   (gate: the 14 `relation-*.wkt` fixtures, SURVEY.md §5)
  * - routes: `/root/reference/src/main/scala/vectorpipe/relations/Routes.scala:12-58`
  */
object RelationAssembly {
  val WayType: Byte = 2
  private val prep = new PreparedGeometryFactory

  /** OSM multipolygon build. Roles steer only the closed-ring shortcut; topology
    * (containment parity) decides outer vs inner. Returns None for incomplete or
    * unassemblable relations.
    */
  def buildMultiPolygon(
      types: Seq[Byte],
      roles: Seq[String],
      geoms: Seq[Geometry]): Option[Geometry] = {
    // incomplete: a way member with no geometry
    if (types.zip(geoms).exists { case (t, g) => t == WayType && g == null }) return None
    if (types.isEmpty) return None

    // member geometries as lines: polygons contribute their exterior ring
    val lines: Seq[(String, LineString)] = roles.zip(geoms).flatMap {
      case (role, p: Polygon)    => Some(role -> p.getExteriorRing.asInstanceOf[LineString])
      case (role, l: LineString) => Some(role -> l)
      case _                     => None
    }

    // closed rings become polygons directly; open lines await stitching;
    // only outer/inner/empty roles participate
    val complete = Vector.newBuilder[Polygon]
    val partial = Vector.newBuilder[LineString]
    lines.foreach { case (role, line) =>
      if (role == "outer" || role == "inner" || role == "") {
        if (line.isClosed && line.getNumPoints >= 4)
          complete += Geo.factory.createPolygon(line.getCoordinates)
        else partial += line
      }
    }

    try {
      val stitched = Segments.formRingPolygons(
        partial.result().sortBy(l => -l.getNumPoints))
      val rings: Seq[Polygon] = complete.result() ++ stitched
      if (rings.isEmpty) return Some(Geo.factory.createMultiPolygon(Array.empty[Polygon]))

      // containment parity over all rings (roles ignored): even # of containers
      // -> outer, odd -> inner; the largest ring is always an outer
      val prepared = rings.map(r => (r, prep.create(r)))
      val byAreaDesc = rings.sortBy(r => -r.getArea)
      var outers = Vector(byAreaDesc.head)
      var inners = Vector.empty[Polygon]
      byAreaDesc.tail.foreach { ring =>
        val containers = prepared.count { case (r, pr) => (r ne ring) && pr.contains(ring) }
        if (containers % 2 == 0) outers :+= ring else inners :+= ring
      }

      // dissolve touching outers; holes born from the union become inners,
      // and islands inside dissolved inners become outers
      val (dissolvedOuters, bornInners) = Segments.dissolveRings(outers)
      val (dissolvedInners, bornOuters) = Segments.dissolveRings(
        inners.map(p => Geo.factory.createPolygon(p.getExteriorRing.getCoordinates)) ++ bornInners)

      // assign each inner to the largest containing outer, consuming it
      var available = dissolvedInners
      val polygons = (dissolvedOuters ++ bornOuters).sortBy(p => -p.getArea).map { outer =>
        val po = prep.create(outer)
        val (mine, rest) = available.partition(inner => po.contains(inner))
        available = rest
        Geo.factory.createPolygon(
          Geo.factory.createLinearRing(outer.getExteriorRing.getCoordinates),
          mine.map(h => Geo.factory.createLinearRing(h.getExteriorRing.getCoordinates)).toArray)
      }

      polygons match {
        case Seq(p) => Some(p)
        case ps     => Some(Geo.factory.createMultiPolygon(ps.toArray))
      }
    } catch {
      case _: Throwable => None // unassemblable (open rings, topology errors, ...)
    }
  }

  /** Route relation build: stitch member lines per role. Returns one
    * (role, LineString | MultiLineString) per role, role-sorted for determinism.
    */
  def buildRoute(
      types: Seq[Byte],
      roles: Seq[String],
      geoms: Seq[Geometry]): Option[Seq[(String, Geometry)]] = {
    if (types.zip(geoms).exists { case (t, g) => t == WayType && g == null }) return None
    if (types.isEmpty) return None
    try {
      val byRole = roles.zip(geoms).filter(_._2 != null).groupBy(_._1)
      val out = byRole.toSeq.sortBy(_._1).map { case (role, members) =>
        val lines = Segments.connectLines(members.map(_._2))
        lines match {
          case Seq(one) => role -> (one: Geometry)
          case many     => role -> Geo.factory.createMultiLineString(many.toArray)
        }
      }
      Some(out)
    } catch {
      case _: Throwable => None
    }
  }
}
