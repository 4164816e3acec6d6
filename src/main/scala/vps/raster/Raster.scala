package vps.raster

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Coordinate, Geometry}

import vps.geom.{Geo, TileMath, Wkb}
import vps.sql.functions._

/** Raster <-> vector conversion over the tile grid (north-star capability).
  *
  * A raster tile is (zoom, x, y, cells: Array[Float]) with `resolution^2` cells,
  * row-major, y-down — the same tiling scheme as the MVT pipeline, so raster and
  * vector products align pixel-for-pixel.
  *
  * - [[rasterize]]: burn geometries into per-tile grids. Points increment their
  *   containing cell (weight-summed); lines/polygons burn every intersecting
  *   cell (boundary tested with a prepared geometry). Distribution is the same
  *   salted pattern as tiling: explode by tile key, aggregate partial grids.
  * - [[vectorize]]: cells above a threshold -> cell boxes dissolved into
  *   polygons per tile (classic cascaded union keeps output deterministic).
  */
object Raster {

  final case class RasterTile(zoom: Int, x: Int, y: Int, resolution: Int, cells: Array[Float])

  /** Rasterize (id, geom [, weight]) into per-tile grids at `zoom`. */
  def rasterize(
      input: DataFrame,
      zoom: Int,
      resolution: Int = 256,
      weightCol: Option[String] = None): Dataset[RasterTile] = {
    val spark = input.sparkSession
    import spark.implicits._
    val weighted = weightCol.map(c => input.withColumn("_w", col(c).cast("double")))
      .getOrElse(input.withColumn("_w", lit(1.0)))

    weighted
      .select(col("geom"), col("_w"), explode(tile_keys(col("geom"), zoom)).as("k"))
      .select(st_asWKB(col("geom")).as("wkb"), col("_w"), col("k.x").as("x"), col("k.y").as("y"))
      .as[(Array[Byte], Double, Int, Int)]
      .groupByKey(r => (r._3, r._4))
      .mapGroups[RasterTile] { (key: (Int, Int), rows: Iterator[(Array[Byte], Double, Int, Int)]) =>
        val (x, y) = key
        val env = TileMath.tileEnvelopeLatLng(zoom, x, y)
        val cells = new Array[Float](resolution * resolution)
        val dx = env.getWidth / resolution
        val dy = env.getHeight / resolution
        rows.foreach { case (wkb, w, _, _) =>
          val g = Wkb.read(wkb)
          g match {
            case p: org.locationtech.jts.geom.Point =>
              val c = p.getCoordinate
              val ci = clamp(((c.x - env.getMinX) / dx).toInt, resolution)
              val cj = clamp(((env.getMaxY - c.y) / dy).toInt, resolution)
              cells(cj * resolution + ci) += w.toFloat
            case other =>
              // burn every cell whose box intersects the geometry, scanning only
              // the envelope-covered cell range
              val ge = other.getEnvelopeInternal
              val i0 = clamp(((ge.getMinX - env.getMinX) / dx).toInt, resolution)
              val i1 = clamp(((ge.getMaxX - env.getMinX) / dx).toInt, resolution)
              val j0 = clamp(((env.getMaxY - ge.getMaxY) / dy).toInt, resolution)
              val j1 = clamp(((env.getMaxY - ge.getMinY) / dy).toInt, resolution)
              val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(other)
              var j = j0
              while (j <= j1) {
                var i = i0
                while (i <= i1) {
                  val cellBox = Geo.box(
                    env.getMinX + i * dx, env.getMaxY - (j + 1) * dy,
                    env.getMinX + (i + 1) * dx, env.getMaxY - j * dy)
                  if (prepared.intersects(cellBox)) cells(j * resolution + i) += w.toFloat
                  i += 1
                }
                j += 1
              }
          }
        }
        RasterTile(zoom, x, y, resolution, cells)
      }
  }

  private def clamp(v: Int, res: Int): Int = math.max(0, math.min(res - 1, v))

  /** Vectorize: cells with value >= threshold become polygons (cell boxes
    * dissolved per tile). Output: (zoom, x, y, geom, n_cells).
    */
  def vectorize(tiles: Dataset[RasterTile], threshold: Float = 1.0f): DataFrame = {
    val spark = tiles.sparkSession
    import spark.implicits._
    implicit val geomEnc: org.apache.spark.sql.Encoder[(Int, Int, Int, Geometry, Int)] = {
      Geo.registerUDTs()
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    }
    tiles.flatMap { t =>
      val env = TileMath.tileEnvelopeLatLng(t.zoom, t.x, t.y)
      val res = t.resolution
      val dx = env.getWidth / res
      val dy = env.getHeight / res
      val boxes = Vector.newBuilder[org.locationtech.jts.geom.Polygon]
      var n = 0
      var j = 0
      while (j < res) {
        var i = 0
        while (i < res) {
          if (t.cells(j * res + i) >= threshold) {
            n += 1
            boxes += Geo.box(
              env.getMinX + i * dx, env.getMaxY - (j + 1) * dy,
              env.getMinX + (i + 1) * dx, env.getMaxY - j * dy)
          }
          i += 1
        }
        j += 1
      }
      val bs = boxes.result()
      if (bs.isEmpty) Iterator.empty
      else {
        val dissolved = vps.kernels.CascadedUnion.union(bs)
        (0 until dissolved.getNumGeometries)
          .map(dissolved.getGeometryN)
          .collect { case p: org.locationtech.jts.geom.Polygon => (t.zoom, t.x, t.y, p: Geometry, n) }
          .iterator
      }
    }.toDF("zoom", "x", "y", "geom", "n_cells")
  }
}
