package vps.kernels

import org.locationtech.jts.geom._
import scala.collection.mutable
import vps.geom.Geo

/** Segment chaining / ring forming / ring dissolving kernels.
  *
  * Semantics follow the reference's greedy stitcher
  * (`/root/reference/src/main/scala/vectorpipe/relations/package.scala:17-118`):
  * repeatedly extend the head chain with the first remaining segment whose start
  * (or, reversed, whose end) coincides with the chain's end; a chain that can't be
  * extended is emitted (connect) or must be closed (rings). Implementation here is
  * an iterative array builder instead of the reference's lazy virtual coordinate
  * sequences — same outputs, flat allocation profile.
  */
object Segments {

  final class AssemblyException(msg: String) extends Exception(msg)

  private def sameCoords(a: Array[Coordinate], b: Array[Coordinate]): Boolean =
    a.length == b.length && {
      var i = 0
      while (i < a.length && a(i).x == b(i).x && a(i).y == b(i).y) i += 1
      i == a.length
    }

  /** Append `next` (skipping its first coordinate) to `chain`, reversed if asked. */
  private def extend(chain: mutable.ArrayBuffer[Coordinate], next: Array[Coordinate], reversed: Boolean): Unit =
    if (reversed) {
      var i = next.length - 2
      while (i >= 0) { chain += next(i); i -= 1 }
    } else {
      var i = 1
      while (i < next.length) { chain += next(i); i += 1 }
    }

  /** Greedily chain segments; unconnectable chains are emitted as-is. */
  def connect(segments: Seq[Array[Coordinate]]): Seq[Array[Coordinate]] =
    stitch(segments, requireClosed = false)

  /** Like [[connect]] but every chain must close, else [[AssemblyException]].
    * A chain already closed is emitted before extension is attempted.
    */
  def formRings(segments: Seq[Array[Coordinate]]): Seq[Array[Coordinate]] =
    stitch(segments, requireClosed = true)

  private def stitch(segments: Seq[Array[Coordinate]], requireClosed: Boolean): Seq[Array[Coordinate]] = {
    val out = mutable.ArrayBuffer.empty[Array[Coordinate]]
    var pending: List[Array[Coordinate]] = segments.toList
    var chain: mutable.ArrayBuffer[Coordinate] = null

    def closed(c: mutable.ArrayBuffer[Coordinate]): Boolean =
      c.head.x == c.last.x && c.head.y == c.last.y

    while (pending.nonEmpty || chain != null) {
      if (chain == null) {
        chain = mutable.ArrayBuffer.from(pending.head)
        pending = pending.tail
      }
      if (requireClosed && closed(chain)) {
        out += chain.toArray
        chain = null
      } else {
        val ex = chain.last.x
        val ey = chain.last.y
        // first tail segment starting at the chain end
        pending.find(s => s(0).x == ex && s(0).y == ey) match {
          case Some(next) =>
            extend(chain, next, reversed = false)
            pending = pending.filterNot(s => sameCoords(s, next))
          case None =>
            // first tail segment ending at the chain end (use it reversed)
            pending.find(s => s(s.length - 1).x == ex && s(s.length - 1).y == ey) match {
              case Some(next) =>
                extend(chain, next, reversed = true)
                pending = pending.filterNot(s => sameCoords(s, next))
              case None =>
                if (requireClosed)
                  throw new AssemblyException("Unable to connect segments.")
                out += chain.toArray
                chain = null
            }
        }
      }
    }
    out.toSeq
  }

  def connectLines(segments: Seq[Geometry]): Seq[LineString] =
    connect(segments.collect { case l: LineString => l.getCoordinates })
      .map(Geo.factory.createLineString)

  def formRingPolygons(segments: Seq[LineString]): Seq[Polygon] =
    formRings(segments.map(_.getCoordinates))
      .map(cs => Geo.factory.createPolygon(cs))

  /** Union rings and split the result into (exterior-ring polygons, interior-ring
    * polygons) — the reference's `dissolveRings`.
    */
  def dissolveRings(rings: Seq[Polygon]): (Seq[Polygon], Seq[Polygon]) = {
    if (rings.isEmpty) return (Seq.empty, Seq.empty)
    val unioned = CascadedUnion.union(rings)
    val polys = (0 until unioned.getNumGeometries).map(unioned.getGeometryN(_)).collect {
      case p: Polygon => p
    }
    val shells = polys.map(p => Geo.factory.createPolygon(p.getExteriorRing.getCoordinates))
    val holes = polys.flatMap(p =>
      (0 until p.getNumInteriorRing).map(i => Geo.factory.createPolygon(p.getInteriorRingN(i).getCoordinates)))
    (shells, holes)
  }
}
