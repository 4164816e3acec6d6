package vps.kernels

import org.locationtech.jts.geom._
import org.locationtech.jts.index.strtree.STRtree
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import vps.geom.Geo

/** Classic cascaded polygon union (Vivid Solutions' published algorithm: STR-tree
  * grouping + binary-tree merge, envelope-disjoint pairs combined VERBATIM, only
  * envelope-overlapping pairs run a real overlay).
  *
  * JTS 1.20's built-in union normalizes ring orientation even for inputs it never
  * merged; the reference's fixtures (built against the older overlay) preserve
  * source ring orientation for disjoint components, so we keep the classic
  * combine-verbatim behavior here.
  */
object CascadedUnion {
  private val NodeCapacity = 4

  def union(polys: Seq[Polygon]): Geometry = {
    if (polys.isEmpty) return Geo.factory.createGeometryCollection(Array.empty)
    if (polys.size == 1) return polys.head
    val index = new STRtree(NodeCapacity)
    polys.foreach(p => index.insert(p.getEnvelopeInternal, p))
    val tree = index.itemsTree()
    unionTree(tree)
  }

  private def unionTree(tree: java.util.List[_]): Geometry =
    binaryUnion(reduceToGeometries(tree))

  private def reduceToGeometries(tree: java.util.List[_]): IndexedSeq[Geometry] =
    tree.asScala.map {
      case sub: java.util.List[_] => unionTree(sub)
      case g: Geometry            => g
    }.toIndexedSeq

  private def binaryUnion(geoms: IndexedSeq[Geometry]): Geometry = {
    def go(start: Int, end: Int): Geometry =
      if (end - start <= 1) geoms(start)
      else if (end - start == 2) unionSafe(geoms(start), geoms(start + 1))
      else {
        val mid = (start + end) / 2
        unionSafe(go(start, mid), go(mid, end))
      }
    go(0, geoms.length)
  }

  private def unionSafe(g0: Geometry, g1: Geometry): Geometry =
    if (g0 == null && g1 == null) null
    else if (g0 == null) g1.copy()
    else if (g1 == null) g0.copy()
    else unionOptimized(g0, g1)

  private def unionOptimized(g0: Geometry, g1: Geometry): Geometry = {
    val e0 = g0.getEnvelopeInternal
    val e1 = g1.getEnvelopeInternal
    if (!e0.intersects(e1)) combine(Seq(g0, g1)) // verbatim, no rebuild
    else if (g0.getNumGeometries <= 1 && g1.getNumGeometries <= 1) unionActual(g0, g1)
    else {
      val common = e0.intersection(e1)
      unionUsingEnvelopeIntersection(g0, g1, common)
    }
  }

  /** Union only the components whose envelopes reach the shared envelope; pass the
    * rest through untouched (this is what preserves their ring orientation).
    */
  private def unionUsingEnvelopeIntersection(g0: Geometry, g1: Geometry, common: Envelope): Geometry = {
    val disjoint = mutable.ArrayBuffer.empty[Geometry]
    val in0 = extractByEnvelope(common, g0, disjoint)
    val in1 = extractByEnvelope(common, g1, disjoint)
    val unioned = unionActual(in0, in1)
    disjoint += unioned
    combine(disjoint.toSeq)
  }

  private def extractByEnvelope(env: Envelope, g: Geometry, disjoint: mutable.ArrayBuffer[Geometry]): Geometry = {
    val intersecting = mutable.ArrayBuffer.empty[Geometry]
    (0 until g.getNumGeometries).foreach { i =>
      val part = g.getGeometryN(i)
      if (part.getEnvelopeInternal.intersects(env)) intersecting += part
      else disjoint += part
    }
    combine(intersecting.toSeq)
  }

  private def unionActual(g0: Geometry, g1: Geometry): Geometry =
    if (g0 == null || g0.isEmpty) restrictToPolygons(g1)
    else if (g1 == null || g1.isEmpty) restrictToPolygons(g0)
    else restrictToPolygons(g0.union(g1))

  private def restrictToPolygons(g: Geometry): Geometry = g match {
    case null => null
    case p if p.isInstanceOf[Polygon] || p.isInstanceOf[MultiPolygon] => p
    case gc =>
      val ps = mutable.ArrayBuffer.empty[Polygon]
      def walk(x: Geometry): Unit = x match {
        case p: Polygon => ps += p
        case c: GeometryCollection => (0 until c.getNumGeometries).foreach(i => walk(c.getGeometryN(i)))
        case _ => ()
      }
      walk(gc)
      if (ps.length == 1) ps.head else Geo.factory.createMultiPolygon(ps.toArray)
  }

  /** Flatten polygonal parts in order into a Polygon/MultiPolygon, verbatim. */
  private def combine(gs: Seq[Geometry]): Geometry = {
    val ps = mutable.ArrayBuffer.empty[Polygon]
    def walk(x: Geometry): Unit = x match {
      case p: Polygon => ps += p
      case c: GeometryCollection => (0 until c.getNumGeometries).foreach(i => walk(c.getGeometryN(i)))
      case _ => ()
    }
    gs.filter(_ != null).foreach(walk)
    if (ps.isEmpty) Geo.factory.createGeometryCollection(Array.empty)
    else if (ps.length == 1) ps.head
    else Geo.factory.createMultiPolygon(ps.toArray)
  }
}
