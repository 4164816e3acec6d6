package vps.joins

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.sql.functions._

class GeocodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("withRegions appends containing region names; regionsByKey aggregates") {
    val regions = Seq(
      ("west", "POLYGON ((-10 -10, 0 -10, 0 10, -10 10, -10 -10))"),
      ("east", "POLYGON ((0 -10, 10 -10, 10 10, 0 10, 0 -10))"),
      ("all", "POLYGON ((-10 -10, 10 -10, 10 10, -10 10, -10 -10))"))
      .toDF("name", "wkt").select($"name", st_geomFromWKT($"wkt").as("geom"))
    val pts = Seq(
      (1L, 10L, -5.0, 0.0), // west + all
      (2L, 10L, 5.0, 0.0),  // east + all
      (3L, 20L, 50.0, 50.0) // nowhere
    ).toDF("id", "changeset", "lon", "lat")
      .select($"id", $"changeset", st_point($"lon", $"lat").as("geom"))

    val geocoded = Geocode.withRegions(pts, regions)
    val m = geocoded.select($"id", $"regions").as[(Long, Seq[String])].collect().toMap
    assert(m(1L) === Seq("all", "west"))
    assert(m(2L) === Seq("all", "east"))
    assert(m(3L) === Seq.empty)
    assert(geocoded.count() === 3) // left outer: no row loss

    val byChangeset = Geocode.regionsByKey(geocoded, "changeset")
      .as[(Long, Seq[String])].collect().toMap
    assert(byChangeset(10L) === Seq("all", "east", "west"))
    assert(byChangeset.get(20L).isEmpty) // no regions -> no row
  }
}
