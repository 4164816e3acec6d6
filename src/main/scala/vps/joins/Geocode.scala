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
    val spark = df.sparkSession
    import vps.sql.functions.{st_asWKB, st_geomFromWKB}
    // materialize the (small, broadcastable) region side ONCE and assign ids on
    // the driver: deriving ids with monotonically_increasing_id and evaluating
    // the lineage twice (broadcast collect + ids join) can mismatch if the
    // input's partitioning is non-deterministic
    val regionRows: Array[(Long, String, Array[Byte])] = regions
      .select(col(nameCol).cast("string"), st_asWKB(col(geomCol)))
      .collect()
      .zipWithIndex
      .map { case (r, i) => (i.toLong, r.getString(0), r.getAs[Array[Byte]](1)) }
    import spark.implicits._
    val named = regionRows.toSeq.toDF("__rid", "__rname", "__wkb")
      .select(col("__rid"), col("__rname"), st_geomFromWKB(col("__wkb")).as("geom"))
    val ids = named.select(col("__rid"), col("__rname"))
    val marker = "__geocode_row"
    // persist: the marker ids must be identical in both downstream evaluations
    // (the pip probe and the final join-back)
    val withKey = df.withColumn(marker, monotonically_increasing_id()).persist()
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
