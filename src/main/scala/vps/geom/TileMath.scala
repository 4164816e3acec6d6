package vps.geom

import org.locationtech.jts.geom.{Envelope, Geometry}

/** Slippy-map (ZXY) tile layout math + closed-form WebMercator<->LatLng.
  *
  * Stands in for the reference's GeoTrellis `ZoomedLayoutScheme`/`LayoutDefinition`
  * (tile keying `/root/reference/src/main/scala/vectorpipe/vectortile/package.scala:41-47`,
  * reprojection defaults `/root/reference/src/main/scala/vectorpipe/VectorPipe.scala:49,66`).
  * All formulas are the public EPSG:3857 / OSM slippy-map equations.
  */
object TileMath {
  val EarthRadius: Double = 6378137.0
  val OriginShift: Double = math.Pi * EarthRadius // 20037508.342789244
  /** WebMercator valid latitude bound. */
  val MaxLat: Double = 85.05112877980659

  // ---- LatLng (EPSG:4326) <-> WebMercator (EPSG:3857) ----
  def lonToMercX(lon: Double): Double = lon / 180.0 * OriginShift
  def latToMercY(lat: Double): Double = {
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    math.log(math.tan((90.0 + clamped) * math.Pi / 360.0)) * EarthRadius
  }
  def mercXToLon(x: Double): Double = x / OriginShift * 180.0
  def mercYToLat(y: Double): Double =
    math.atan(math.exp(y / EarthRadius)) * 360.0 / math.Pi - 90.0

  // ---- ZXY tile addressing (lat/lon domain) ----
  def numTiles(zoom: Int): Int = 1 << zoom

  private def clampTile(v: Int, zoom: Int): Int =
    math.max(0, math.min(numTiles(zoom) - 1, v))

  def tileX(lon: Double, zoom: Int): Int =
    clampTile(math.floor((lon + 180.0) / 360.0 * numTiles(zoom)).toInt, zoom)

  def tileY(lat: Double, zoom: Int): Int = {
    val clamped = math.max(-MaxLat, math.min(MaxLat, lat))
    val latRad = math.toRadians(clamped)
    val y = (1.0 - math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
    clampTile(math.floor(y * numTiles(zoom)).toInt, zoom)
  }

  /** Tile envelope in lon/lat degrees; y axis is inverted (y=0 at the north). */
  def tileEnvelopeLatLng(zoom: Int, x: Int, y: Int): Envelope = {
    val n = numTiles(zoom).toDouble
    val lonMin = x / n * 360.0 - 180.0
    val lonMax = (x + 1) / n * 360.0 - 180.0
    def lat(ty: Double): Double = {
      val yy = math.Pi * (1.0 - 2.0 * ty / n)
      math.toDegrees(math.atan(math.sinh(yy)))
    }
    new Envelope(lonMin, lonMax, lat(y + 1.0), lat(y.toDouble))
  }

  /** Tile envelope in WebMercator meters. */
  def tileEnvelopeMercator(zoom: Int, x: Int, y: Int): Envelope = {
    val n = numTiles(zoom).toDouble
    val tileSpan = 2.0 * OriginShift / n
    val xmin = -OriginShift + x * tileSpan
    val ymax = OriginShift - y * tileSpan
    new Envelope(xmin, xmin + tileSpan, ymax - tileSpan, ymax)
  }

  /** All ZXY keys whose tile envelope intersects the geometry's envelope —
    * the engine's `keyTo(layout)` (reference `vectortile/package.scala:41-47`).
    * Geometry coordinates are lon/lat degrees.
    */
  def keysForEnvelope(env: Envelope, zoom: Int): Seq[(Int, Int)] = {
    if (env == null || env.isNull) return Seq.empty
    val x0 = tileX(env.getMinX, zoom)
    val x1 = tileX(env.getMaxX, zoom)
    val y0 = tileY(env.getMaxY, zoom) // north edge -> smaller y
    val y1 = tileY(env.getMinY, zoom)
    for (x <- x0 to x1; y <- y0 to y1) yield (x, y)
  }

  def keysForGeometry(g: Geometry, zoom: Int): Seq[(Int, Int)] =
    if (g == null || g.isEmpty) Seq.empty
    else keysForEnvelope(g.getEnvelopeInternal, zoom)
}
