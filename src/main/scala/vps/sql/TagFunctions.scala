package vps.sql

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** OSM tag predicate / hygiene functions (SURVEY.md §2.8 F1-F18) as *builtin
  * expression compositions* — no opaque UDFs, so column pruning and predicate
  * pushdown keep working through them (the reference wraps these in Scala UDFs,
  * `/root/reference/src/main/scala/vectorpipe/functions/osm/package.scala`).
  *
  * Truth tables (AreaKeys et al.) follow the public osmlab/id-area-keys v2.13.0
  * dataset, same as the reference.
  */
object TagFunctions {

  private val TruthyValues = Seq("yes", "true", "1")
  private val FalsyValues = Seq("no", "false", "0")
  private val BooleanValues = TruthyValues ++ FalsyValues
  private val MultiPolygonTypes = Seq("multipolygon", "boundary")
  private val WaterwayValues = Seq(
    "river", "riverbank", "canal", "stream", "stream_end", "brook", "drain", "ditch",
    "dam", "weir", "waterfall", "pressurised")
  private val PoiTags = Seq("amenity", "shop", "craft", "office", "leisure", "aeroway")

  /** id-area-keys v2.13.0: key -> values that stay LINES (inverted lists). */
  val AreaKeys: Map[String, Set[String]] = Map(
    "addr:*" -> Set(),
    "advertising" -> Set("billboard"),
    "aerialway" -> Set("cable_car", "chair_lift", "drag_lift", "gondola", "goods",
      "magic_carpet", "mixed_lift", "platter", "rope_tow", "t-bar"),
    "aeroway" -> Set("runway", "taxiway"),
    "allotments" -> Set(),
    "amenity" -> Set("bench"),
    "area:highway" -> Set(),
    "attraction" -> Set("dark_ride", "river_rafting", "summer_toboggan", "train", "water_slide"),
    "bridge:support" -> Set(),
    "building" -> Set(),
    "camp_site" -> Set(),
    "club" -> Set(),
    "craft" -> Set(),
    "emergency" -> Set("designated", "destination", "no", "official", "private", "yes"),
    "golf" -> Set("hole", "lateral_water_hazard", "water_hazard"),
    "healthcare" -> Set(),
    "historic" -> Set(),
    "industrial" -> Set(),
    "internet_access" -> Set(),
    "junction" -> Set("circular", "roundabout"),
    "landuse" -> Set(),
    "leisure" -> Set("slipway", "track"),
    "man_made" -> Set("breakwater", "crane", "cutline", "embankment", "groyne", "pier", "pipeline"),
    "military" -> Set(),
    "natural" -> Set("cliff", "coastline", "ridge", "tree_row"),
    "office" -> Set(),
    "piste:type" -> Set("downhill", "hike", "ice_skate", "nordic", "skitour", "sled", "sleigh"),
    "place" -> Set(),
    "playground" -> Set("balancebeam", "slide", "zipwire"),
    "power" -> Set("cable", "line", "minor_line"),
    "public_transport" -> Set("platform"),
    "residential" -> Set(),
    "seamark:type" -> Set(),
    "shop" -> Set(),
    "tourism" -> Set("artwork"),
    "traffic_calming" -> Set("bump", "cushion", "dip", "hump", "rumble_strip"),
    "waterway" -> Set("canal", "dam", "ditch", "drain", "river", "stream", "weir"))

  /** normalize + split `;`-delimited tag values, lower-cased (reference F1). */
  def splitDelimitedValues(values: Column, default: Column = lit("")): Column =
    split(lower(coalesce(regexp_replace(trim(values), "\\s*;\\s*", ";"), default)), ";")

  /** OSM area rules (reference F2): explicit area=yes/no wins; otherwise any
    * matching AreaKeys key where at least one `;`-value is NOT in the inverted
    * line-value list makes it an area.
    */
  def isArea(tags: Column): Column = {
    val areaVals = splitDelimitedValues(tags.getItem("area"))
    val explicitBoolean = arrays_overlap(areaVals, lit(BooleanValues.toArray))
    val explicitTruthy = arrays_overlap(areaVals, lit(TruthyValues.toArray))
    val keyTests = AreaKeys.toSeq.sortBy(_._1).map { case (key, lineValues) =>
      val vals = splitDelimitedValues(tags.getItem(key))
      tags.getItem(key).isNotNull && (
        if (lineValues.isEmpty) lit(true)
        // some value falls outside the line-list => area
        else size(filter(vals, v => !v.isin(lineValues.toSeq.map(lit): _*))) > 0
      )
    }
    when(tags.isNull, lit(null))
      .when(tags.getItem("area").isNotNull && explicitBoolean, explicitTruthy)
      .otherwise(keyTests.reduce(_ || _)).as("isArea")
  }

  def isMultiPolygon(tags: Column): Column =
    arrays_overlap(splitDelimitedValues(tags.getItem("type")), lit(MultiPolygonTypes.toArray))
      .as("isMultiPolygon")

  def isRoute(tags: Column): Column =
    array_contains(splitDelimitedValues(tags.getItem("type")), "route").as("isRoute")

  def isNew(version: Column, minorVersion: Column): Column =
    (version <=> 1 && minorVersion <=> 0).as("isNew")

  def isTagged(tags: Column): Column = (size(map_keys(tags)) > 0).as("isTagged")

  def isBuilding(tags: Column): Column =
    (!lower(coalesce(tags.getItem("building"), lit("no"))).isin(FalsyValues: _*)).as("isBuilding")

  def isPOI(tags: Column): Column =
    arrays_overlap(map_keys(tags), lit(PoiTags.toArray)).as("isPOI")

  def isRoad(tags: Column): Column = tags.getItem("highway").isNotNull.as("isRoad")

  def isCoastline(tags: Column): Column =
    array_contains(splitDelimitedValues(tags.getItem("natural")), "coastline").as("isCoastline")

  def isWaterway(tags: Column): Column =
    arrays_overlap(splitDelimitedValues(tags.getItem("waterway")), lit(WaterwayValues.toArray))
      .as("isWaterway")

  // ---- tag hygiene (reference F14/F15) ----

  private val UninterestingTags = Set(
    "created_by", "source", "comment", "_id", "clc", "odbl", "origen", "converted_by",
    "todo", "import_tools", "id", "importuuid", "attribution", "curve_geometry",
    "memphis_fixup", "importance", "description=ru-mos-325", "stamväg", "_fid_", "1",
    "_description_", "ccpr", "dfg", "source_ref", "ref:urbis", "accuracy:meters",
    "sub_sea:type", "waterway:type", "statscan:rbuid", "ref:ruian:addr", "ref:ruian",
    "building:ruian:type", "dibavod:id", "uir_adr:adresa_kod", "gst:feat_id",
    "maaamet:etak", "ref:fr:fantoir", "3dshapes:ggmodelk", "and_nosr_r", "oppdaterin",
    "addr:city:simc", "addr:street:sym_ul", "building:usage:pl", "building:use:pl",
    "teryt:simc", "raba:id", "dcgis:gis_id", "nycdoitt:bin", "chicago:building_id",
    "lojic:bgnum", "massgis:way_id", "objtype", "sk53_bulk:load")

  private val UninterestingPrefixes = Set(
    "clc", "tiger", "sby", "navibot", "nps", "hoot", "error", "project", "geobase",
    "canvec", "osak", "kms", "ngbe", "it:fvg", "ksj2", "yh", "linz2osm", "linz",
    "wroclawgis", "naptap", "gnis", "nhd", "mvdgis")

  private val UninterestingSingleTags = Set("colour")

  private val prefixRegex = "^(" + UninterestingPrefixes.toSeq.sorted
    .map(java.util.regex.Pattern.quote).mkString("|") + "):"

  /** Drop blocklisted keys (reference `removeUninterestingTags`), as a pure
    * `map_filter` composition.
    */
  def removeUninterestingTags(tags: Column): Column =
    map_filter(tags, (k, _) => {
      val lk = lower(k)
      !lk.isin(UninterestingTags.toSeq: _*) &&
        !(size(map_keys(tags)) === 1 && lk.isin(UninterestingSingleTags.toSeq: _*)) &&
        !lk.rlike(prefixRegex) &&
        !k.contains("=") &&
        !k.contains(" ")
    })

  /** Drop `source` and `source:*` (reference `removeSemiInterestingTags`). */
  def removeSemiInterestingTags(tags: Column): Column =
    map_filter(tags, (k, _) => {
      val lk = lower(k)
      lk =!= "source" && !lk.startsWith("source:")
    })

  // ---- hashtags (reference F13) ----

  // same character classes as the reference's HashtagMatcher / ContentMatcher
  private val HashtagPattern: String =
    "#([^\\u2000-\\u206F\\u2E00-\\u2E7F\\s\\\\'!\"#$%()*,./;<=>?@\\[\\]^{|}~]+)"
  private val ContentPattern: String =
    "[\\p{L}\\uD83C-\\uDBFF\\uDC00-\\uDFFF]" // letters or emoji (surrogate ranges)

  def hashtags(comment: Column): Column =
    when(comment.isNotNull && length(comment) > 0,
      array_distinct(transform(
        filter(
          transform(regexp_extract_all(comment, lit(HashtagPattern), lit(1)), lower _),
          t => t.rlike(ContentPattern)),
        t => regexp_replace(t, "[:]$", ""))))
      .otherwise(array().cast("array<string>")).as("hashtags")

  // ---- misc helpers (reference F17/F18) ----

  def asDouble(c: Column): Column = when(c.isNotNull, c.cast("double")).otherwise(lit(Double.NaN))
  def asFloat(c: Column): Column = when(c.isNotNull, c.cast("float")).otherwise(lit(Float.NaN))

  def flattenDistinct(c: Column): Column = array_distinct(flatten(c))
  def mergeSets(a: Column, b: Column): Column = array_distinct(array_union(a, b))
  def without(c: Column, value: Column): Column = array_remove(c, value)

  /** Seq[String] -> Map[value -> count] (reference `count_values`). */
  def countValues(c: Column): Column =
    map_from_entries(transform(array_distinct(c),
      v => struct(v, size(filter(c, x => x === v)))))
}
