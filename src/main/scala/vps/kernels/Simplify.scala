package vps.kernels

import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.simplify.{DouglasPeuckerSimplifier, TopologyPreservingSimplifier}
import vps.geom.TileMath

/** Per-zoom simplification (reference: `vectortile/Simplify.scala:16-18`, applied
  * `VectorPipe.scala:185-190`). Tolerance defaults to one tile-local unit at the
  * zoom — vertices closer than what a tile pixel can resolve are redundant.
  */
object Simplify {
  /** Degrees-per-tile-unit at a zoom (lon axis; the conservative choice). */
  def toleranceForZoom(zoom: Int, extent: Int = 4096): Double =
    360.0 / TileMath.numTiles(zoom) / extent

  /** Douglas-Peucker: fast, may break topology; use for lines/points-on-lines. */
  def douglasPeucker(g: Geometry, tolerance: Double): Geometry =
    if (g == null || g.isEmpty) g else DouglasPeuckerSimplifier.simplify(g, tolerance)

  /** Topology-preserving: keeps rings valid; use for polygons (reference default). */
  def topologyPreserving(g: Geometry, tolerance: Double): Geometry =
    if (g == null || g.isEmpty) g else TopologyPreservingSimplifier.simplify(g, tolerance)

  def forZoom(g: Geometry, zoom: Int, preserveTopology: Boolean = true): Geometry = {
    val tol = toleranceForZoom(zoom)
    if (preserveTopology) topologyPreserving(g, tol) else douglasPeucker(g, tol)
  }
}
