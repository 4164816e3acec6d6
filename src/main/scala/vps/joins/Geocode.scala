package vps.joins

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reverse-geocode helper mirroring the reference's `util/Geocode.scala:88-116`
  * surface: append the containing region names to point rows and aggregate the
  * distinct regions touched per changeset/group.
  */
object Geocode {

  /** Append `regions: array<string>` — names of polygons containing each row's
    * geometry (empty array when none). Polygon side is broadcast (STRtree +
    * prepared geometries, reference J9).
    *
    * @param df      rows with a geometry column `geomCol`
    * @param regions (region_id: long, name: string, geometry `geomCol`)
    */
  def withRegions(
      df: DataFrame,
      regions: DataFrame,
      geomCol: String = "geom",
      nameCol: String = "name"): DataFrame = {
    val named = regions.select(
      monotonically_increasing_id().as("__rid"),
      col(nameCol).as("__rname"), col(geomCol).as("geom"))
    val ids = named.select(col("__rid"), col("__rname"))
    val marker = "__geocode_row"
    val withKey = df.withColumn(marker, monotonically_increasing_id())
    val hits = SpatialJoins.pipBroadcast(
      withKey.select(col(marker), col(geomCol).as("geom")),
      named.select(col("__rid").as("poly_id"), col("geom")),
      polyIdCol = "poly_id")
      .join(ids, col("poly_id") === col("__rid"))
      .groupBy(col(marker))
      .agg(sort_array(collect_set(col("__rname"))).as("regions"))
    withKey
      .join(hits, Seq(marker), "left_outer")
      .withColumn("regions", coalesce(col("regions"), array().cast("array<string>")))
      .drop(marker)
  }

  /** Distinct regions per group key (the reference's
    * `groupBy('changeset).agg(collect_set('country))`).
    */
  def regionsByKey(geocoded: DataFrame, keyCol: String): DataFrame =
    geocoded
      .select(col(keyCol), explode(col("regions")).as("region"))
      .groupBy(col(keyCol))
      .agg(sort_array(collect_set(col("region"))).as("regions"))
}
