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

/** Phase-1 packed features for one (tile, salt) bucket. `layers(i)` is null in
  * single-layer mode (resolved to Options.layerName at encode time), so the
  * common case pays one null bit per feature, not a repeated string. `geoms`
  * are PRE-ENCODED MVT geometry payloads (command ints in tile-local coords),
  * not WKB: smaller through the merge shuffle (a point is ~4-8 varint bytes vs
  * 21 WKB bytes) and phase 2 never re-parses geometry. `areas` ride along only
  * when Options.orderAreas needs them (0.0 otherwise).
  */
private[tiling] final case class Partial(
    x: Int, y: Int, salt: Int,
    ids: Array[Long], layers: Array[String], types: Array[Int],
    areas: Array[Double], geoms: Array[Array[Byte]])

object TilePipeline {

  type TileRow = vps.tiling.TileRow
  val TileRow = vps.tiling.TileRow

  final case class Options(
      layerName: String = "features",
      /** When set, the input column holding each feature's layer name — the
        * reference's LayerNamesInColumn (`VectorPipe.scala:151-165`): one
        * emitted tile carries multiple named MVT layers. When None, all
        * features go to the single layer `layerName`.
        */
      layerColumn: Option[String] = None,
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
      spreadBeforeClip: Boolean = false,
      /** A/B switch (measurement): carry clipped WKB through the phase-1
        * exchange and encode command-ints inside phase 1, instead of the fused
        * pre-exchange encode. Output bytes identical either way.
        */
      wkbPhase1: Boolean = false)

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

    val layerExpr = opts.layerColumn
      .map(c => col(c).cast("string"))
      .getOrElse(lit(null).cast("string"))
    val exploded = simplified
      .select(col("id").cast("long").as("id"), layerExpr.as("layer"), col("geom"),
        explode(tile_keys(col("geom"), zoom)).as("k"))
      .select(col("id"), col("layer"), col("geom"), col("k.x").as("x"), col("k.y").as("y"))
    packAndEncode(exploded, zoom, opts)
  }

  /** Tile one zoom of an already-keyed frame (id, layer, geom, x, y) where
    * `geom` is the ORIGINAL (un-simplified) geometry — the [[pyramidRekey]]
    * path. Per-zoom simplification happens here, after keying; since the key
    * set from the original geometry is a superset of the keys the simplified
    * geometry would produce, and empty clips are filtered, output tiles are
    * byte-identical to [[tileZoom]].
    */
  def tileZoomKeyed(frame: DataFrame, zoom: Int, opts: Options = Options()): Dataset[TileRow] = {
    val simplified =
      if (opts.simplify)
        frame.withColumn("geom",
          st_simplify(col("geom"), lit(vps.kernels.Simplify.toleranceForZoom(zoom, opts.extent)),
            preserveTopology = opts.preserveTopology))
      else frame
    packAndEncode(simplified, zoom, opts)
  }

  /** Salt, clip, pack, merge, encode — shared tail of both keyed entry points.
    * Input: (id: long, layer: string-or-null, geom, x, y).
    */
  private def packAndEncode(keyed: DataFrame, zoom: Int, opts: Options): Dataset[TileRow] = {
    val spark = keyed.sparkSession
    import spark.implicits._
    val exploded = keyed
      .withColumn("salt", pmod(col("id"), lit(opts.saltBuckets)).cast("int"))

    val spread =
      if (opts.spreadBeforeClip) exploded.repartition(col("x"), col("y"), col("salt"))
      else exploded

    implicit val partialEnc = Encoders.product[Partial]
    val partials = if (opts.wkbPhase1) {
      // A/B alternative: clipped WKB through the exchange, encode in phase 1
      val clipped = spread
        .withColumn("geom", st_clipToTile(col("geom"), lit(zoom), col("x"), col("y")))
        .where(!st_isEmpty(col("geom")))
      clipped
        .select(col("x"), col("y"), col("salt"), col("id"), col("layer"), st_asWKB(col("geom")).as("wkb"))
        .as[(Int, Int, Int, Long, String, Array[Byte])]
        .groupByKey(r => (r._1, r._2, r._3))
        .mapGroups[Partial] { (key: (Int, Int, Int), rows: Iterator[(Int, Int, Int, Long, String, Array[Byte])]) =>
          val (x, y, salt) = key
          val toTile = TileBuilder.lonLatToTile(zoom, x, y, opts.extent)
          val feats = rows.map { case (_, _, _, id, layer, wkb) =>
            val g = toTile.transform(Wkb.read(wkb))
            val (geomType, payload) = Mvt.encodeGeometryPacked(g)
            (id, layer, geomType, if (opts.orderAreas) g.getArea else 0.0, payload)
          }.toArray.sortBy(_._1)
          Partial(x, y, salt, feats.map(_._1), feats.map(_._2), feats.map(_._3),
            feats.map(_._4), feats.map(_._5))
        }
    } else {
      // clip -> tile-local transform -> MVT command-int encode, fused in ONE
      // generator BEFORE the tile exchange: the shuffle carries pre-encoded
      // fragments (points: ~4-8 bytes vs 21-byte WKB), geometry is parsed
      // exactly once per (feature, tile), and empty clips vanish without a
      // pushdown-duplicated isEmpty predicate
      val frags = spread
        .select(col("x"), col("y"), col("salt"), col("id"), col("layer"),
          explode(tile_fragments(col("geom"), zoom, col("x"), col("y"),
            opts.extent, opts.orderAreas)).as("f"))
        .select(col("x"), col("y"), col("salt"), col("id"), col("layer"),
          col("f.geomType").as("gt"), col("f.area").as("area"), col("f.payload").as("payload"))

      // phase 1: pack fragments per (tile, salt), id-sorted
      frags
        .as[(Int, Int, Int, Long, String, Int, Double, Array[Byte])]
        .groupByKey(r => (r._1, r._2, r._3))
        .mapGroups[Partial] { (key: (Int, Int, Int), rows: Iterator[(Int, Int, Int, Long, String, Int, Double, Array[Byte])]) =>
          val (x, y, salt) = key
          val feats = rows.map { case (_, _, _, id, layer, gt, area, payload) =>
            (id, layer, gt, area, payload)
          }.toArray.sortBy(_._1)
          Partial(x, y, salt, feats.map(_._1), feats.map(_._2), feats.map(_._3),
            feats.map(_._4), feats.map(_._5))
        }
    }

    // phase 2: merge partials per tile, group into named layers (sorted by
    // name), deterministic id order inside each layer, concatenate the
    // pre-encoded fragments into layer + tile bytes
    partials
      .groupByKey(p => (p.x, p.y))
      .mapGroups[TileRow] { (key: (Int, Int), ps: Iterator[Partial]) =>
        val (x, y) = key
        val feats = ps.toArray.sortBy(_.salt).iterator.flatMap { p =>
          (0 until p.ids.length).iterator.map { i =>
            (if (p.layers(i) == null) opts.layerName else p.layers(i),
              Mvt.RawFeature(p.ids(i), p.types(i), p.geoms(i), p.areas(i)))
          }
        }.toArray
        val layers = feats.groupBy(_._1).toSeq.sortBy(_._1).map { case (name, fs) =>
          val ordered = TileBuilder.orderRawFeatures(
            fs.map(_._2).sortBy(_.id).toSeq, opts.orderAreas)
          (Mvt.encodeLayerRawBytes(name, opts.extent, ordered), fs.length)
        }
        val bytes = Mvt.encodeTileFromLayerBytes(layers.map(_._1))
        TileRow(zoom, x, y, bytes, layers.iterator.map(_._2).sum)
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

  /** Pyramid via parent re-key (the reference's `reduceKeys` fold,
    * `VectorPipe.scala:118-122,195`): tile keys are computed from the input
    * ONCE at maxZoom; every coarser zoom derives its keys by halving the
    * previous frame's keys (exact: the z-1 tiles intersecting an envelope are
    * precisely the parents of the intersecting z tiles). The full-resolution
    * input is scanned once, not once per zoom; frames are persisted between
    * zooms (reference's optional DISK_ONLY persist, `VectorPipe.scala:188`).
    *
    * Output tiles are byte-identical to [[pyramid]] — see [[tileZoomKeyed]].
    *
    * Materializes each zoom eagerly via `sink` (needed to unpersist frames
    * deterministically); returns per-zoom (tiles, features) counts.
    */
  def pyramidRekey(
      input: DataFrame,
      minZoom: Int,
      maxZoom: Int,
      opts: Options = Options(),
      reduce: (DataFrame, Int) => DataFrame = (df, _) => df,
      persist: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)(
      sink: (Int, Dataset[TileRow]) => Unit): Seq[(Int, Long, Long)] = {
    require(minZoom <= maxZoom)
    val spark = input.sparkSession
    import spark.implicits._
    val layerExpr = opts.layerColumn
      .map(c => col(c).cast("string"))
      .getOrElse(lit(null).cast("string"))
    var frame = input
      .select(col("id").cast("long").as("id"), layerExpr.as("layer"), col("geom"),
        explode(tile_keys(col("geom"), maxZoom)).as("k"))
      .select(col("id"), col("layer"), col("geom"), col("k.x").as("x"), col("k.y").as("y"))
    val out = Seq.newBuilder[(Int, Long, Long)]
    var z = maxZoom
    var prev: Option[DataFrame] = None
    while (z >= minZoom) {
      frame.persist(persist)
      val tiles = tileZoomKeyed(reduce(frame, z), z, opts).persist(persist)
      sink(z, tiles)
      val stats = tiles.toDF()
        .agg(count(lit(1)), sum(col("features").cast("long"))).head()
      out += ((z, stats.getLong(0), if (stats.isNullAt(1)) 0L else stats.getLong(1)))
      tiles.unpersist()
      prev.foreach(_.unpersist())
      prev = Some(frame)
      if (z > minZoom) {
        // re-key: parents of the previous frame's keys, deduped per feature
        frame = frame
          .select(col("id"), col("layer"), col("geom"),
            shiftright(col("x"), 1).as("x"), shiftright(col("y"), 1).as("y"))
          .dropDuplicates("id", "layer", "x", "y")
      }
      z -= 1
    }
    prev.foreach(_.unpersist())
    out.result()
  }
}
