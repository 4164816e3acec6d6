package vps.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import vps.SparkTestSession
import vps.sql.TagFunctions._

/** Truth tables ported from the reference's FunctionSpec
  * (`/root/reference/src/test/scala/vectorpipe/functions/osm/FunctionSpec.scala:11-224`).
  */
class TagFunctionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def truthTable(cases: Seq[(Map[String, String], Boolean)])(
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Unit = {
    val df = cases.toDF("tags", "value")
    val mismatches = df.where(f($"tags") =!= $"value").collect()
    assert(mismatches.isEmpty, mismatches.mkString(", "))
  }

  test("isArea marks area=* appropriately") {
    truthTable(Seq(
      Map("area" -> "yes") -> true, Map("area" -> "YES") -> true, Map("area" -> "YeS") -> true,
      Map("area" -> "1") -> true, Map("area" -> "true") -> true, Map("area" -> "True") -> true,
      Map("area" -> "no") -> false, Map("area" -> "0") -> false,
      Map("area" -> "something") -> false,
      Map("area" -> "yes;no") -> true, Map("area" -> "yes; no") -> true,
      Map("area" -> "yes ; no") -> true, Map("area" -> "yes ;no") -> true))(isArea)
  }

  test("isArea respects area-keys") {
    truthTable(Seq(
      Map("office" -> "architect") -> true,
      Map("waterway" -> "riverbank") -> true,
      Map("waterway" -> "canal") -> false,
      Map("aeroway" -> "aerodrome;apron") -> true,
      Map("aeroway" -> "aerodrome ; runway") -> true,
      Map("aeroway" -> "taxiway;runway") -> false))(isArea)
  }

  test("isMultiPolygon") {
    truthTable(Seq(
      Map("type" -> "multipolygon") -> true, Map("type" -> "boundary") -> true,
      Map("type" -> "route") -> false, Map("type" -> "multipolygon;boundary") -> true,
      Map("type" -> "multipolygon ; boundary") -> true))(isMultiPolygon)
  }

  test("isRoute") {
    truthTable(Seq(
      Map("type" -> "multipolygon") -> false, Map("type" -> "boundary") -> false,
      Map("type" -> "route") -> true, Map("type" -> "route;boundary") -> true,
      Map("type" -> "route ; boundary") -> true))(isRoute)
  }

  test("isBuilding") {
    truthTable(Seq(
      Map("building" -> "yes") -> true, Map("building" -> "no") -> false,
      Map("building" -> "false") -> false, Map("building" -> "farm") -> true,
      Map("building" -> "farm;apartments") -> true))(isBuilding)
  }

  test("isPOI") {
    truthTable(Seq(
      Map("amenity" -> "cafe") -> true, Map("shop" -> "bakery") -> true,
      Map("craft" -> "bakery") -> true, Map("office" -> "architect") -> true,
      Map("leisure" -> "disc_golf_course") -> true, Map("aeroway" -> "aerodrome") -> true,
      Map("highway" -> "motorway") -> false, Map("shop" -> "bakery ; dairy") -> true))(isPOI)
  }

  test("isRoad") {
    truthTable(Seq(
      Map("highway" -> "motorway") -> true, Map("highway" -> "path") -> true,
      Map("highway" -> "path ;footway") -> true, Map("building" -> "yes") -> false))(isRoad)
  }

  test("isCoastline") {
    truthTable(Seq(
      Map("natural" -> "coastline") -> true, Map("natural" -> "water") -> false,
      Map("natural" -> "coastline ; water") -> true))(isCoastline)
  }

  test("isWaterway") {
    truthTable(Seq(
      Map("waterway" -> "river") -> true, Map("waterway" -> "riverbank") -> true,
      Map("waterway" -> "canal") -> true, Map("waterway" -> "stream") -> true,
      Map("waterway" -> "brook") -> true, Map("waterway" -> "drain") -> true,
      Map("waterway" -> "ditch") -> true, Map("waterway" -> "dam") -> true,
      Map("waterway" -> "weir") -> true, Map("waterway" -> "waterfall") -> true,
      Map("waterway" -> "pressurised") -> true, Map("waterway" -> "fuel") -> false,
      Map("waterway" -> "canal ; stream") -> true, Map("waterway" -> "canal ; fuel") -> true))(isWaterway)
  }

  test("removeUninterestingTags") {
    val out = Seq(
      Map("building" -> "yes", "created_by" -> "JOSM"),
      Map("building" -> "yes", "colour" -> "grey"),
      Map("colour" -> "grey"),
      Map("highway" -> "motorway", "tiger:reviewed" -> "no"),
      Map("building" -> "yes", "CLC:something" -> "something"),
      Map("highway" -> "motorway", "k=v" -> "value"),
      Map("building" -> "yes", "land use" -> "something"))
      .toDF("tags")
      .withColumn("tags", removeUninterestingTags($"tags"))
      .collect()
    assert(out === Array(
      Row(Map("building" -> "yes")),
      Row(Map("building" -> "yes", "colour" -> "grey")),
      Row(Map.empty[String, String]),
      Row(Map("highway" -> "motorway")),
      Row(Map("building" -> "yes")),
      Row(Map("highway" -> "motorway")),
      Row(Map("building" -> "yes"))))
  }

  test("removeSemiInterestingTags") {
    val out = Seq(
      Map("building" -> "yes", "source" -> "MassGIS"),
      Map("highway" -> "motorway", "source:geometry" -> "MassGIS"))
      .toDF("tags")
      .withColumn("tags", removeSemiInterestingTags($"tags"))
      .collect()
    assert(out === Array(Row(Map("building" -> "yes")), Row(Map("highway" -> "motorway"))))
  }

  test("hashtags extraction") {
    val out = Seq(
      "fixing roads #hotosm-project-1 #MissingMaps today",
      "#dup #dup #123 #trailing: #ok",
      "").toDF("comment")
      .select(hashtags($"comment").as("h"))
      .as[Seq[String]]
      .collect()
    assert(out(0) === Seq("hotosm-project-1", "missingmaps"))
    assert(out(1) === Seq("dup", "trailing", "ok")) // #123 has no letters; dup distinct; trailing ':' stripped
    assert(out(2) === Seq.empty)
  }

  test("isNew and countValues") {
    val df = Seq((1, 0), (1, 1), (2, 0)).toDF("version", "minorVersion")
    assert(df.where(isNew($"version", $"minorVersion")).count() === 1)
    val cv = Seq(Seq("a", "b", "a")).toDF("xs").select(countValues($"xs")).as[Map[String, Int]].head()
    assert(cv === Map("a" -> 2, "b" -> 1))
  }

  test("aggregators: reduceTags and weightedCentroid") {
    import vps.sql.functions._
    val merged = Seq(Map("a" -> "1"), Map("a" -> "2", "b" -> "x"), Map("a" -> "1"))
      .toDF("tags").select(Aggregators.reduceTags($"tags").as("t")).as[Map[String, String]].head()
    assert(merged === Map("a" -> "1;2", "b" -> "x"))

    val pts = Seq((0.0, 0.0, 1.0), (10.0, 10.0, 3.0)).toDF("lon", "lat", "w")
      .select(st_point($"lon", $"lat").as("g"), $"w")
    val c = pts.select(Aggregators.weightedCentroid($"g", $"w").as("c"))
      .select(st_x($"c"), st_y($"c")).as[(Double, Double)].head()
    assert(c === ((7.5, 7.5)))
  }
}
