package vps.mvt

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.util.AffineTransformation
import vps.geom.TileMath

/** Lon/lat geometry -> tile-local coordinate transform + layer assembly,
  * replacing the reference's geotrellis `StrictLayer` builder
  * (`/root/reference/src/main/scala/vectorpipe/vectortile/package.scala:74-161`).
  */
object TileBuilder {
  val DefaultExtent = 4096

  /** Affine lon/lat -> tile-local ([0,extent], y-down) for tile (zoom,x,y). */
  def lonLatToTile(zoom: Int, x: Int, y: Int, extent: Int = DefaultExtent): AffineTransformation = {
    val env = TileMath.tileEnvelopeLatLng(zoom, x, y)
    val sx = extent / env.getWidth
    val sy = extent / env.getHeight
    // x' = (lon - minX) * sx ; y' = (maxY - lat) * sy
    new AffineTransformation(sx, 0.0, -env.getMinX * sx, 0.0, -sy, env.getMaxY * sy)
  }

  def toTileCoords(g: Geometry, zoom: Int, x: Int, y: Int, extent: Int = DefaultExtent): Geometry =
    lonLatToTile(zoom, x, y, extent).transform(g)

  /** Build a single layer. `orderAreas` draws large polygons first (the reference's
    * `orderAreas` option, `VectorPipe.scala:31-32` / sort `vectortile/package.scala:116-131`);
    * within a family the original order is kept, families ordered polygon/line/point
    * so points draw on top. Ordering is deterministic (required for byte-identical
    * re-runs / checkpoint resume).
    */
  def buildLayer(
      name: String,
      features: Seq[MvtFeature],
      extent: Int = DefaultExtent,
      orderAreas: Boolean = false): MvtLayer = {
    val (polys, rest) = features.partition(f =>
      f.geometry.isInstanceOf[Polygon] || f.geometry.isInstanceOf[MultiPolygon])
    val (lines, points) = rest.partition(f =>
      f.geometry.isInstanceOf[LineString] || f.geometry.isInstanceOf[MultiLineString])
    val orderedPolys =
      if (orderAreas) polys.sortBy(f => -f.geometry.getArea)
      else polys
    MvtLayer(name, extent, version = 2, orderedPolys ++ lines ++ points)
  }

  /** Same family ordering (polygons / lines / points, large areas first when
    * `orderAreas`) for pre-encoded features — keeps the raw path byte-
    * identical to [[buildLayer]] + encode.
    */
  def orderRawFeatures(feats: Seq[Mvt.RawFeature], orderAreas: Boolean): Seq[Mvt.RawFeature] = {
    val (polys, rest) = feats.partition(_.geomType == Mvt.GeomPolygon)
    val (lines, points) = rest.partition(_.geomType == Mvt.GeomLine)
    val orderedPolys = if (orderAreas) polys.sortBy(f => -f.area) else polys
    orderedPolys ++ lines ++ points
  }
}
