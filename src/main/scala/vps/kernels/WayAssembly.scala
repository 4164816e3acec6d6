package vps.kernels

import org.locationtech.jts.geom.{Coordinate, Geometry}
import vps.geom.Geo

/** Ordered way coordinates -> geometry (the reference's way-assembly kernel,
  * `/root/reference/src/main/scala/vectorpipe/internal/package.scala:267-300`):
  * - no coordinates: empty LineString
  * - any missing/NaN coordinate: null (invalid)
  * - single coordinate: Point
  * - closed with >=4 points and isArea: Polygon
  * - otherwise: LineString
  * - invalid result geometry: null
  */
object WayAssembly {
  def assemble(coords: Seq[(Double, Double)], isArea: Boolean): Geometry = {
    val geom: Option[Geometry] =
      if (coords.isEmpty) Some(Geo.factory.createLineString(Array.empty[Coordinate]))
      else if (coords.exists { case (x, y) => x.isNaN || y.isNaN }) None
      else if (coords.length == 1) Some(Geo.point(coords.head._1, coords.head._2))
      else {
        val line = Geo.factory.createLineString(coords.map { case (x, y) => new Coordinate(x, y) }.toArray)
        if (isArea && line.getNumPoints >= 4 && line.isClosed)
          Some(Geo.factory.createPolygon(line.getCoordinateSequence))
        else Some(line)
      }
    geom match {
      case Some(g) if g.isValid => g
      case _                    => null
    }
  }
}
