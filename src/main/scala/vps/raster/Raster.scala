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
  *   cell (boundary tested with a prepared geometry). Distribution: explode by
  *   tile key, then ONE grid-carrying exchange — partial grids are built
  *   map-side by [[GridBurn]] and merged by cell addition, salt-free.
  * - [[vectorize]]: cells above a threshold -> cell boxes dissolved into
  *   polygons per tile (classic cascaded union keeps output deterministic).
  */
object Raster {

  final case class RasterTile(zoom: Int, x: Int, y: Int, resolution: Int, cells: Array[Float])

  /** Rasterize (id, geom [, weight]) into per-tile grids at `zoom`.
    *
    * Scale shape: ONE exchange keyed by tile, and it carries PARTIAL GRIDS —
    * [[GridBurn]] is a TypedImperativeAggregate whose buffer is the
    * `resolution^2` float grid, so points burn map-side and partials merge by
    * cell addition. A hot tile costs one grid per map partition instead of a
    * per-point row flood into a single reducer; sparse partials ship as
    * (index, value) pairs (see GridBurn).
    */
  def rasterize(
      input: DataFrame,
      zoom: Int,
      resolution: Int = 256,
      weightCol: Option[String] = None): Dataset[RasterTile] = {
    val spark = input.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.vps.ColumnBridge.{column => cb, expression => ex}
    val weighted = weightCol.map(c => input.withColumn("_w", col(c).cast("double")))
      .getOrElse(input.withColumn("_w", lit(1.0)))

    val keyed = weighted
      .select(col("geom"), col("_w"), explode(tile_keys(col("geom"), zoom)).as("k"))
      .select(st_asWKB(col("geom")).as("wkb"), col("_w"), col("k.x").as("x"), col("k.y").as("y"))
    val burn = cb(GridBurn(ex(col("wkb")), ex(col("_w")), ex(col("x")), ex(col("y")),
      zoom, resolution).toAggregateExpression())
    keyed
      .groupBy(col("x"), col("y"))
      .agg(burn.as("cells"))
      .select(lit(zoom).as("zoom"), col("x"), col("y"),
        lit(resolution).as("resolution"), col("cells"))
      .as[RasterTile]
  }

  /** Reference implementation of [[rasterize]] that shuffles every point row
    * to its tile's reducer — kept ONLY as the byte-equality oracle for
    * RasterSpec (same [[burn]] kernel, opposite shuffle shape). Do not use at
    * scale: a hot tile floods one reducer with O(points) rows.
    */
  private[vps] def rasterizePointShuffle(
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
        val cells = new Array[Double](resolution * resolution)
        rows.foreach { case (wkb, w, _, _) => burn(Wkb.read(wkb), w, env, resolution, cells) }
        RasterTile(zoom, x, y, resolution, cells.map(_.toFloat))
      }
  }

  /** Burn one geometry into a tile grid (shared by both rasterize paths and
    * [[GridBurn]]): points increment their containing cell; other geometries
    * burn every cell whose box intersects, scanning only the envelope-covered
    * range with a prepared geometry. Cells accumulate in DOUBLE (rounded to
    * float once at output), so weights that are not exactly float-representable
    * don't make the result depend on partial-merge arrival order.
    */
  private[raster] def burn(
      g: Geometry,
      w: Double,
      env: org.locationtech.jts.geom.Envelope,
      resolution: Int,
      cells: Array[Double]): Unit = {
    val dx = env.getWidth / resolution
    val dy = env.getHeight / resolution
    g match {
      case p: org.locationtech.jts.geom.Point =>
        val c = p.getCoordinate
        val ci = clamp(((c.x - env.getMinX) / dx).toInt, resolution)
        val cj = clamp(((env.getMaxY - c.y) / dy).toInt, resolution)
        cells(cj * resolution + ci) += w
      case other =>
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
            if (prepared.intersects(cellBox)) cells(j * resolution + i) += w
            i += 1
          }
          j += 1
        }
    }
  }

  private def clamp(v: Int, res: Int): Int = math.max(0, math.min(res - 1, v))

  /** Zonal statistics: per-zone aggregates of raster cell values whose cell
    * CENTER falls inside the zone polygon, over NONZERO cells (sparse raster
    * semantics — tiles only exist where data does).
    * Output: (zone_id, n_cells, sum, mean, min, max).
    *
    * Scale shape: the (small, broadcastable) zone side is collected once and
    * indexed per task (STRtree + prepared geometries — the shared broadcast
    * probe core); raster tiles stream MAP-SIDE, each emitting one partial
    * stats row per touched zone per partition; the only exchange is the final
    * constant-size per-zone merge.
    */
  def zonalStats(
      tiles: Dataset[RasterTile],
      zones: DataFrame,
      zoneIdCol: String = "zone_id",
      zoneGeomCol: String = "geom"): DataFrame = {
    val spark = tiles.sparkSession
    import org.apache.spark.sql.Encoders
    import vps.sql.functions.st_asWKB
    val zoneRows: Array[(Long, Array[Byte])] = zones
      .select(col(zoneIdCol).cast("long"), st_asWKB(col(zoneGeomCol)))
      .as[(Long, Array[Byte])](Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .collect()
    val bc = spark.sparkContext.broadcast(zoneRows)

    implicit val partialEnc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
    val partials = tiles.mapPartitions { ts =>
      val index = vps.joins.SpatialJoins.buildIndex(bc.value)
      // zone_id -> (n, sum, min, max)
      val acc = scala.collection.mutable.HashMap.empty[Long, (Long, Double, Double, Double)]
      ts.foreach { t =>
        val env = TileMath.tileEnvelopeLatLng(t.zoom, t.x, t.y)
        val rawHits = index.query(env)
        if (!rawHits.isEmpty) {
          val hits = new Array[(Long, org.locationtech.jts.geom.prep.PreparedGeometry)](rawHits.size)
          var h = 0
          while (h < hits.length) {
            hits(h) = rawHits.get(h)
              .asInstanceOf[(Long, org.locationtech.jts.geom.prep.PreparedGeometry)]
            h += 1
          }
          val res = t.resolution
          val dx = env.getWidth / res
          val dy = env.getHeight / res
          var cj = 0
          while (cj < res) {
            var ci = 0
            while (ci < res) {
              val v = t.cells(cj * res + ci)
              if (v != 0f) {
                val pt = Geo.factory.createPoint(new Coordinate(
                  env.getMinX + (ci + 0.5) * dx, env.getMaxY - (cj + 0.5) * dy))
                var k = 0
                while (k < hits.length) {
                  val (zid, pg) = hits(k)
                  if (pg.intersects(pt)) {
                    val (n, s, mn, mx) = acc.getOrElse(zid,
                      (0L, 0.0, Double.MaxValue, Double.MinValue))
                    acc(zid) = (n + 1, s + v, math.min(mn, v), math.max(mx, v))
                  }
                  k += 1
                }
              }
              ci += 1
            }
            cj += 1
          }
        }
      }
      acc.iterator.map { case (zid, (n, s, mn, mx)) => (zid, n, s, mn, mx) }
    }

    partials.toDF("zone_id", "n", "s", "mn", "mx")
      .groupBy("zone_id")
      .agg(sum(col("n")).as("n_cells"), sum(col("s")).as("sum"),
        min(col("mn")).as("min"), max(col("mx")).as("max"))
      .withColumn("mean", col("sum") / col("n_cells"))
      .select("zone_id", "n_cells", "sum", "mean", "min", "max")
  }

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
