package vps.tiling

import org.apache.spark.sql.{DataFrame, Dataset}

/** User-facing pipeline facade mirroring the reference's `VectorPipe.apply` +
  * `Pipeline` hook surface (`VectorPipe.scala:88-197`, `Pipeline.scala:28-47`)
  * on the Dataset-native fold: per zoom, Select -> Reduce -> Simplify -> Key ->
  * Clip -> Pack -> Encode -> Finalize.
  */
trait Pipeline {
  /** Layer name for encoded tiles. */
  def layerName: String = "features"

  /** Filter/shape the frame for a zoom (reference `Pipeline.select`). */
  def select(input: DataFrame, zoom: Int): DataFrame = input

  /** Decimate/aggregate between zooms (reference `Pipeline.reduce`), e.g.
    * weighted-centroid binning. Runs on the frame feeding `zoom`.
    */
  def reduce(input: DataFrame, zoom: Int): DataFrame = input

  /** Simplify before keying? (reference applies per-zoom simplify). */
  def simplify: Boolean = true

  /** Draw large polygons first inside a tile. */
  def orderAreas: Boolean = false

  /** Sink hook per zoom (reference `Pipeline.finalize`). */
  def finalizeZoom(tiles: Dataset[TileRow], zoom: Int): Unit = ()
}

object VectorPipe {
  final case class Options(
      minZoom: Int,
      maxZoom: Int,
      extent: Int = 4096,
      saltBuckets: Int = 8,
      outputDir: Option[String] = None)

  /** Run the pyramid over (id, geom) input; writes `z/x/y.mvt` + lineage when
    * `outputDir` is set, always calls the pipeline's finalize hook. Returns
    * per-zoom tile datasets (lazy, re-usable).
    */
  def apply(input: DataFrame, pipeline: Pipeline, options: Options): Seq[(Int, Dataset[TileRow])] = {
    require(input.columns.contains("id") && input.columns.contains("geom"),
      "input must have columns (id, geom)")
    val opts = TilePipeline.Options(
      layerName = pipeline.layerName,
      extent = options.extent,
      saltBuckets = options.saltBuckets,
      orderAreas = pipeline.orderAreas,
      simplify = pipeline.simplify)
    (options.maxZoom to options.minZoom by -1).map { zoom =>
      val frame = pipeline.reduce(pipeline.select(input, zoom), zoom)
      val tiles = TilePipeline.tileZoom(frame, zoom, opts)
      options.outputDir.foreach(dir => TileSink.write(tiles, dir))
      pipeline.finalizeZoom(tiles, zoom)
      zoom -> tiles
    }
  }
}
