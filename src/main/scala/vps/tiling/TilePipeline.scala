package vps.tiling

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Geometry

import vps.geom.{Wkb}
import vps.mvt.{Mvt, MvtFeature, MvtTile, MvtValue, TileBuilder}
import vps.sql.functions._

/** The per-zoom tiling fold of the reference (`VectorPipe.scala:88-197`,
  * Select -> Clip -> Pack -> Tile -> Reduce -> Simplify -> Re-key) rebuilt fully
  * inside the Dataset API — no `.rdd` hop, no Kryo; geometry rides the WKB UDT
  * through Tungsten.
  *
  * Skew strategy (SURVEY.md §4 "salted two-phase tile aggregation"): a hot tile
  * (all features land on one key) is split across `saltBuckets` partial groups;
  * phase 1 clips + packs features per (tile, salt), phase 2 merges the partials
  * and encodes one MVT per tile. Shuffle 1 carries raw features spread over
  * salt buckets; shuffle 2 carries already-packed partials (one row per bucket).
  */
/** One encoded tile. */
final case class TileRow(zoom: Int, x: Int, y: Int, mvt: Array[Byte], features: Int)

/** Phase-1 packed features for one (tile, salt) bucket. */
private[tiling] final case class Partial(
    x: Int, y: Int, salt: Int,
    ids: Array[Long], geoms: Array[Array[Byte]])

object TilePipeline {

  type TileRow = vps.tiling.TileRow
  val TileRow = vps.tiling.TileRow

  final case class Options(
      layerName: String = "features",
      extent: Int = 4096,
      saltBuckets: Int = 8,
      orderAreas: Boolean = false,
      simplify: Boolean = true,
      /** Douglas-Peucker by default (north-star spec); set true for JTS
        * topology-preserving simplification (the reference's default).
        */
      preserveTopology: Boolean = false,
      clipTimeoutMs: Long = 5000,
      /** Force an extra shuffle by (tile, salt) BEFORE clipping, so pathological
        * geometries clustered in input partitions get spread first (the
        * reference's repartition-then-clip). Off by default: the phase-1
        * groupByKey exchange already distributes by (tile, salt), and clipping
        * map-side removes a full-corpus shuffle.
        */
      spreadBeforeClip: Boolean = false)

  /** Tile one zoom level. Input: (id: long, geom: GeometryUDT) [+ ignored extra
    * columns]. Deterministic output: per tile, features sorted by id.
    */
  def tileZoom(input: DataFrame, zoom: Int, opts: Options = Options()): Dataset[TileRow] = {
    val spark = input.sparkSession
    import spark.implicits._

    val simplified =
      if (opts.simplify)
        input.withColumn("geom",
          st_simplify(col("geom"), lit(vps.kernels.Simplify.toleranceForZoom(zoom, opts.extent)),
            preserveTopology = opts.preserveTopology))
      else input

    val exploded = simplified
      .select(col("id").cast("long").as("id"), col("geom"),
        explode(tile_keys(col("geom"), zoom)).as("k"))
      .select(col("id"), col("geom"), col("k.x").as("x"), col("k.y").as("y"))
      .withColumn("salt", pmod(col("id"), lit(opts.saltBuckets)).cast("int"))

    val spread =
      if (opts.spreadBeforeClip) exploded.repartition(col("x"), col("y"), col("salt"))
      else exploded
    val clipped = spread
      .withColumn("geom", st_clipToTile(col("geom"), lit(zoom), col("x"), col("y")))
      .where(!st_isEmpty(col("geom")))

    // phase 1: pack features per (tile, salt) — geometry already clipped; store
    // tile-local coords so phase 2 only concatenates + encodes
    implicit val partialEnc = Encoders.product[Partial]
    val partials = clipped
      .select(col("x"), col("y"), col("salt"), col("id"), st_asWKB(col("geom")).as("wkb"))
      .as[(Int, Int, Int, Long, Array[Byte])]
      .groupByKey(r => (r._1, r._2, r._3))
      .mapGroups[Partial] { (key: (Int, Int, Int), rows: Iterator[(Int, Int, Int, Long, Array[Byte])]) =>
        val (x, y, salt) = key
        // one affine transform per (tile, salt) group, not per feature
        val toTile = TileBuilder.lonLatToTile(zoom, x, y, TileBuilder.DefaultExtent)
        val feats = rows.map { case (_, _, _, id, wkb) =>
          (id, Wkb.write(toTile.transform(Wkb.read(wkb))))
        }.toArray.sortBy(_._1)
        Partial(x, y, salt, feats.map(_._1), feats.map(_._2))
      }

    // phase 2: merge partials per tile, deterministic id order, encode MVT
    partials
      .groupByKey(p => (p.x, p.y))
      .mapGroups[TileRow] { (key: (Int, Int), ps: Iterator[Partial]) =>
        val (x, y) = key
        val feats = ps.toArray.sortBy(_.salt).iterator.flatMap { p =>
          p.ids.iterator.zip(p.geoms.iterator)
        }.toArray.sortBy(_._1).map { case (id, wkb) =>
          MvtFeature(Some(id), Wkb.read(wkb), Seq("id" -> MvtValue.I64(id)))
        }
        val layer = TileBuilder.buildLayer(opts.layerName, feats.toSeq,
          opts.extent, opts.orderAreas)
        val bytes = Mvt.encode(MvtTile(Seq(layer)))
        TileRow(zoom, x, y, bytes, layer.features.size)
      }
  }

  /** Build the full pyramid [minZoom, maxZoom], coarsest last. `reduce` runs
    * before each zoom (the reference's per-zoom decimation hook, e.g. weighted
    * centroid binning); default keeps all features.
    */
  def pyramid(
      input: DataFrame,
      minZoom: Int,
      maxZoom: Int,
      opts: Options = Options(),
      reduce: (DataFrame, Int) => DataFrame = (df, _) => df): Seq[(Int, Dataset[TileRow])] = {
    require(minZoom <= maxZoom)
    (maxZoom to minZoom by -1).map { z => z -> tileZoom(reduce(input, z), z, opts) }
  }
}
