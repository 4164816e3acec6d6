package vps.raster

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.geom.TileMath
import vps.sql.functions._

class RasterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("rasterize points: per-cell counts match direct binning; totals preserved") {
    val docs = vps.docs.InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")
    val pts = vps.docs.InterleavedDocs.extractGeoSpans(docs)
      .select(($"id" * 10 + $"span_offset").as("id"), $"geom")
    val zoom = 2
    val res = 64
    val tiles = Raster.rasterize(pts, zoom, res).collect()
    assert(tiles.map(_.cells.map(_.toDouble).sum).sum === pts.count().toDouble)
    // spot-check one tile against direct binning
    val t = tiles.maxBy(_.cells.sum)
    val env = TileMath.tileEnvelopeLatLng(zoom, t.x, t.y)
    val binned = pts
      .select(st_x($"geom").as("lon"), st_y($"geom").as("lat"),
        tile_x(st_x($"geom"), zoom).as("tx"), tile_y(st_y($"geom"), zoom).as("ty"))
      .where($"tx" === t.x && $"ty" === t.y)
      .as[(Double, Double, Int, Int)].collect()
    val expected = new Array[Float](res * res)
    binned.foreach { case (lon, lat, _, _) =>
      val i = math.max(0, math.min(res - 1, ((lon - env.getMinX) / (env.getWidth / res)).toInt))
      val j = math.max(0, math.min(res - 1, ((env.getMaxY - lat) / (env.getHeight / res)).toInt))
      expected(j * res + i) += 1
    }
    assert(t.cells.toSeq === expected.toSeq)
  }

  test("rasterize polygon burns intersecting cells; weight column respected") {
    val poly = Seq((1L, "POLYGON ((0 0, 40 0, 40 40, 0 40, 0 0))", 2.0))
      .toDF("id", "wkt", "wt").select($"id", st_geomFromWKT($"wkt").as("geom"), $"wt")
    val tiles = Raster.rasterize(poly, zoom = 2, resolution = 32, weightCol = Some("wt")).collect()
    assert(tiles.nonEmpty)
    // all burned values are the weight
    assert(tiles.flatMap(_.cells).filter(_ != 0).forall(_ === 2.0f))
    // the polygon covers a contiguous block: at least one tile is substantially burned
    assert(tiles.map(_.cells.count(_ != 0)).max > 100)
  }

  test("zonalStats: per-zone aggregates match direct cell math") {
    // deterministic point cloud with weights, rasterized, then two box zones
    val pts = spark.range(0, 4000).toDF("id")
      .select($"id",
        st_point(($"id" % 80).cast("double") - 20.0, ($"id" / 80).cast("double") - 15.0).as("geom"),
        (($"id" % 7) + 1).cast("double").as("wt"))
    val zoom = 3
    val res = 64
    val tiles = Raster.rasterize(pts, zoom, res, weightCol = Some("wt")).cache()
    val zones = Seq((0L, "POLYGON ((-10 -10, 25 -10, 25 12, -10 12, -10 -10))"),
      (1L, "POLYGON ((30 0, 70 0, 70 40, 30 40, 30 0))")) // zone 1 partly empty
      .toDF("zone_id", "wkt").select($"zone_id", st_geomFromWKT($"wkt").as("geom"))
    val got = Raster.zonalStats(tiles, zones)
      .select($"zone_id", $"n_cells", $"sum", $"mean", $"min", $"max")
      .as[(Long, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap

    // direct oracle: iterate every nonzero cell of every tile, test the center
    val zoneBoxes = Map(0L -> (-10.0, -10.0, 25.0, 12.0), 1L -> (30.0, 0.0, 70.0, 40.0))
    val expected = scala.collection.mutable.Map.empty[Long, (Long, Double, Double, Double)]
    tiles.collect().foreach { t =>
      val env = vps.geom.TileMath.tileEnvelopeLatLng(t.zoom, t.x, t.y)
      val dx = env.getWidth / res; val dy = env.getHeight / res
      for (cj <- 0 until res; ci <- 0 until res) {
        val v = t.cells(cj * res + ci)
        if (v != 0f) {
          val cx = env.getMinX + (ci + 0.5) * dx
          val cy = env.getMaxY - (cj + 0.5) * dy
          zoneBoxes.foreach { case (zid, (x0, y0, x1, y1)) =>
            if (cx >= x0 && cx <= x1 && cy >= y0 && cy <= y1) {
              val (n, s, mn, mx) = expected.getOrElse(zid, (0L, 0.0, Double.MaxValue, Double.MinValue))
              expected(zid) = (n + 1, s + v, math.min(mn, v), math.max(mx, v))
            }
          }
        }
      }
    }
    expected.foreach { case (zid, (n, s, mn, mx)) =>
      val (_, gn, gs, gmean, gmn, gmx) = got(zid)
      assert(gn === n, s"zone $zid n_cells")
      assert(math.abs(gs - s) < 1e-6, s"zone $zid sum")
      assert(math.abs(gmean - s / n) < 1e-9, s"zone $zid mean")
      assert(gmn === mn && gmx === mx, s"zone $zid min/max")
    }
    assert(got.keySet === expected.keySet)
    tiles.unpersist()
  }

  test("vectorize(rasterize(box)) recovers the box within a pixel") {
    val box = Seq((1L, "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"))
      .toDF("id", "wkt").select($"id", st_geomFromWKT($"wkt").as("geom"))
    val zoom = 3
    val res = 128
    val tiles = Raster.rasterize(box, zoom, res)
    val polys = Raster.vectorize(tiles).cache()
    assert(polys.count() > 0)
    // union of vectorized pieces covers the original box and not much more
    val pieces = polys.select(st_asWKB($"geom")).as[Array[Byte]].collect()
      .map(vps.geom.Wkb.read)
    val merged = vps.geom.Geo.factory.createGeometryCollection(pieces).union()
    val original = vps.geom.Wkt.read("POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))")
    val cellSize = 360.0 / (1 << zoom) / res // ~0.35 deg
    assert(merged.covers(original))
    assert(merged.getArea <= original.getArea + 4 * 20 * 2 * cellSize + 4 * cellSize * cellSize * 4,
      s"vectorized area ${merged.getArea} vs ${original.getArea}")
    polys.unpersist()
  }
}
