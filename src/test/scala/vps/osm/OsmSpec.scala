package vps.osm

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

/** End-to-end reconstruction over the reference's real Isle-of-Man extract
  * (RETRIEVED PUBLIC CONTENT, read-only) — the reference's ProcessOSMTest
  * equivalent plus structural invariants it doesn't assert.
  */
class OsmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  implicit lazy val geomEnc: org.apache.spark.sql.Encoder[org.locationtech.jts.geom.Geometry] = {
    vps.geom.Geo.registerUDTs()
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  private lazy val history =
    spark.read.orc("/root/reference/src/test/resources/isle-of-man-latest.osm.orc").cache()

  private lazy val geoms = Osm.toGeometry(history).cache()

  test("reconstructs all three element families with geometries") {
    val byType = geoms.groupBy($"_type").count().as[(Byte, Long)].collect().toMap
    assert(byType.keySet === Set(1.toByte, 2.toByte, 3.toByte))
    assert(byType(1) > 1000, s"nodes: ${byType(1)}") // isle of man has plenty of POIs
    assert(byType(2) > 10000, s"ways: ${byType(2)}")
    assert(byType(3) > 100, s"relations: ${byType(3)}")
  }

  test("middle-ground schema and key uniqueness") {
    assert(geoms.columns.toSeq === Seq("_type", "id", "geom", "tags", "changeset",
      "updated", "validUntil", "visible", "version", "minorVersion"))
    // routes legitimately emit one row per role; include tags for relations
    val dupes = geoms.where($"_type" =!= 3)
      .groupBy($"_type", $"id", $"version", $"minorVersion", $"updated")
      .count().where($"count" > 1).count()
    assert(dupes === 0)
    val relDupes = geoms.where($"_type" === 3)
      .groupBy($"id", $"version", $"minorVersion", $"updated", $"tags")
      .count().where($"count" > 1).count()
    assert(relDupes === 0)
  }

  test("validity windows are well-formed and snapshot picks current versions") {
    val bad = geoms.where($"validUntil".isNotNull && $"validUntil" < $"updated").count()
    assert(bad === 0)
    val snap = Osm.snapshot(geoms)
    // snapshot = the open-ended versions (validUntil null) of currently-updated rows
    assert(snap.count() === geoms.where($"validUntil".isNull).count())
    // snapshot at an early timestamp excludes later versions
    val early = Osm.snapshot(geoms, java.sql.Timestamp.valueOf("2010-01-01 00:00:00"))
    assert(early.count() < snap.count())
    assert(early.where($"updated" > "2010-01-01").count() === 0)
  }

  test("way geometries follow OSM area rules") {
    import vps.sql.functions.st_geometryType
    val ways = geoms.where($"_type" === 2 && $"geom".isNotNull)
      .select(st_geometryType($"geom").as("gt"), vps.sql.TagFunctions.isArea($"tags").as("a"))
    val families = ways.groupBy("gt", "a").count().as[(String, Boolean, Long)].collect()
    // areas became polygons, non-areas lines; both families present on real data
    assert(families.exists { case (gt, a, _) => gt == "Polygon" && a })
    assert(families.exists { case (gt, a, _) => gt == "LineString" && !a })
    // area-tagged closed ways must NOT appear as LineStrings... unless unclosed;
    // sanity: polygons are all valid
    val invalidPolys = geoms.where($"_type" === 2 && $"geom".isNotNull)
      .select($"geom").as[org.locationtech.jts.geom.Geometry]
      .filter(g => g.getGeometryType == "Polygon" && !g.isValid).count()
    assert(invalidPolys === 0)
  }

  test("multipolygon relations produce valid polygonal geometry") {
    val rels = geoms.where($"_type" === 3 && $"geom".isNotNull)
      .select($"geom").as[org.locationtech.jts.geom.Geometry].collect()
    assert(rels.nonEmpty)
    val polygonal = rels.count(g => g.getGeometryType == "Polygon" || g.getGeometryType == "MultiPolygon")
    val linear = rels.count(g => g.getGeometryType == "LineString" || g.getGeometryType == "MultiLineString")
    assert(polygonal > 0 && linear > 0) // boundaries/multipolygons + routes
  }

  test("point geometries carry interesting tags only") {
    val nodes = geoms.where($"_type" === 1)
    assert(nodes.where(size($"tags") === 0).count() === 0)
  }

  test("addUserMetadata joins on changeset") {
    val changesets = geoms.select($"changeset".as("id")).distinct()
      .withColumn("uid", lit(7L)).withColumn("user", lit("tester"))
    val joined = Osm.addUserMetadata(geoms.limit(100), changesets)
    assert(joined.count() === 100)
    assert(joined.where($"user" === "tester").count() === 100)
  }
}
