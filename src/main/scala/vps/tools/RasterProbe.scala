package vps.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import vps.sql.functions._

/** A/B probe for the rasterize shuffle shape: grid-carrying aggregate
  * ([[vps.raster.GridBurn]]) vs the per-point-row shuffle reference path.
  * Two scenarios: UNIFORM (points spread across the world's tiles) and HOT
  * (every point in one tile — the single-reducer flood the grid aggregate
  * exists to fix). Alternating legs, one JVM, medians.
  *
  * Usage: runMain vps.tools.RasterProbe [nPoints] [zoom] [resolution] [rounds] [cpus]
  */
object RasterProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toInt).getOrElse(5000000)
    val zoom = args.lift(1).map(_.toInt).getOrElse(6)
    val resolution = args.lift(2).map(_.toInt).getOrElse(64)
    val rounds = args.lift(3).map(_.toInt).getOrElse(5)
    val cpus = args.lift(4).map(_.toInt).getOrElse(16)
    vps.geom.Geo.registerUDTs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("raster-probe")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val uniform = spark.range(0, nPoints, 1, cpus).toDF("id")
      .select(st_point(
        (col("id") * 9973 % 3600000) / 10000.0 - 180.0,
        (col("id") * 6151 % 1600000) / 10000.0 - 80.0).as("geom"))
      .persist()
    uniform.count()
    // hot tile: everything lands in the zoom-level tile containing (1, 1)
    val hot = spark.range(0, nPoints, 1, cpus).toDF("id")
      .select(st_point(
        lit(1.0) + (col("id") % 10000) / 10000.0,
        lit(1.0) + (col("id") % 7000) / 7000.0).as("geom"))
      .persist()
    hot.count()

    def legGrid(df: DataFrame): Long =
      vps.raster.Raster.rasterize(df, zoom, resolution)
        .toDF().agg(count(lit(1))).head().getLong(0)
    def legPoints(df: DataFrame): Long =
      vps.raster.Raster.rasterizePointShuffle(df, zoom, resolution)
        .toDF().agg(count(lit(1))).head().getLong(0)

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def ab(df: DataFrame): (Double, Double) = {
      time(legGrid(df)); time(legPoints(df)) // warm both
      val gs = collection.mutable.ArrayBuffer.empty[Double]
      val ps = collection.mutable.ArrayBuffer.empty[Double]
      (1 to rounds).foreach { r =>
        if (r % 2 == 1) { gs += time(legGrid(df)); ps += time(legPoints(df)) }
        else { ps += time(legPoints(df)); gs += time(legGrid(df)) }
        System.gc()
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      (med(gs.toSeq), med(ps.toSeq))
    }
    val (ug, up) = ab(uniform)
    val (hg, hp) = ab(hot)
    println(f"""{"probe":"rasterize","points":$nPoints,"zoom":$zoom,"res":$resolution,""" +
      f""""uniform_grid_median_sec":$ug%.3f,"uniform_points_median_sec":$up%.3f,""" +
      f""""hot_grid_median_sec":$hg%.3f,"hot_points_median_sec":$hp%.3f}""")
    spark.stop()
  }
}
