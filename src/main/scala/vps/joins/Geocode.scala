package vps.joins

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType, StructField, StructType}
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.geom.prep.PreparedGeometry

/** Reverse-geocode helper mirroring the reference's `util/Geocode.scala:88-116`
  * surface: append the containing region names to point rows and aggregate the
  * distinct regions touched per changeset/group.
  */
object Geocode {

  /** Append `regions: array<string>` — sorted distinct names of polygons
    * containing each row's geometry (empty array when none). Pure map-side:
    * the (small, broadcastable by contract) region side is collected once,
    * each task builds an STRtree of prepared geometries from the broadcast,
    * and every input row is tagged in place — no join, no shuffle, no marker
    * column, no persisted intermediate (the round-2 shape keyed rows with
    * monotonically_increasing_id and left a cached DataFrame in session
    * storage per call).
    *
    * @param df      rows with a geometry column `geomCol`
    * @param regions (name: string `nameCol`, geometry `geomCol`)
    */
  def withRegions(
      df: DataFrame,
      regions: DataFrame,
      geomCol: String = "geom",
      nameCol: String = "name"): DataFrame = {
    val spark = df.sparkSession
    import vps.sql.functions.st_asWKB
    val regionRows: Array[(String, Array[Byte])] = regions
      // null names are skipped, matching the old collect_set semantics
      .where(col(nameCol).isNotNull)
      .select(col(nameCol).cast("string"), st_asWKB(col(geomCol)))
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .collect()
    val bc = spark.sparkContext.broadcast(regionRows)

    val geomIdx = df.schema.fieldIndex(geomCol)
    val outSchema = StructType(df.schema.fields :+
      StructField("regions", ArrayType(StringType, containsNull = false), nullable = false))
    df.mapPartitions { rows =>
      val index = SpatialJoins.buildIndex(bc.value)
      rows.map { row =>
        val g = row.getAs[Geometry](geomIdx)
        val names =
          if (g == null) Seq.empty[String]
          else {
            val hits = index.query(g.getEnvelopeInternal).iterator()
            val out = scala.collection.mutable.SortedSet.empty[String]
            while (hits.hasNext) {
              val (name, pg) = hits.next().asInstanceOf[(String, PreparedGeometry)]
              if (pg.intersects(g)) out += name
            }
            out.toSeq
          }
        Row.fromSeq(row.toSeq :+ names)
      }
    }(Encoders.row(outSchema))
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
