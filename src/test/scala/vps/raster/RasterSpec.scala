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
