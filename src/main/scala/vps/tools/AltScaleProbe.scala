package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N vs 4N scaling probe for the two headline workloads whose sequential
  * pairs read noisy in round 5 (pip-cell 0.55, zonal 0.51): legs ALTERNATE
  * local[4]/local[16] round-robin inside one JVM, reading a pre-materialized
  * point corpus from tmpfs parquet, so JIT is shared and host drift cancels
  * within a round. Workloads are the exact Bench shapes: pipCellJoin at
  * level 7 over the 1000 bench boxes, and rasterize(z=6, res=16) + zonal
  * stats over the same boxes as zones.
  *
  * Usage: runMain vps.tools.AltScaleProbe [replication] [rounds]
  */
object AltScaleProbe {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(3000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val corpus = s"$base/vps_alt_corpus_$rep" // shared with AltTilesProbe

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.local.dir", s"$base/spark-alt-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    if (!new java.io.File(s"$corpus/_SUCCESS").exists) {
      val s = session(16)
      vps.docs.InterleavedDocs.extractGeoSpans(
        vps.docs.InterleavedDocs.fromDocuments(s, "/root/testdata/sf0.1", rep))
        .select((col("id") * 10 + col("span_offset")).as("id"), col("geom"))
        .write.mode("overwrite").parquet(corpus)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    // leg: one timed run of each workload; returns (pipCellSec, zonalSec)
    def leg(cpus: Int): (Double, Double) = {
      val s = session(cpus)
      vps.geom.Geo.registerUDTs()
      val points = s.read.parquet(corpus).persist()
      points.count()
      val polys = s.range(0, 1000).toDF("poly_id")
        .select(col("poly_id"),
          ((col("poly_id") * 97 % 340) - 170.0).as("lon0"),
          ((col("poly_id") * 61 % 150) - 75.0).as("lat0"))
        .select(col("poly_id"), vps.sql.functions.st_geomFromWKT(format_string(
          "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
          col("lon0"), col("lat0"), col("lon0") + 15.0, col("lat0"),
          col("lon0") + 15.0, col("lat0") + 12.0, col("lon0"), col("lat0") + 12.0,
          col("lon0"), col("lat0"))).as("geom"))
        .persist()
      polys.count()
      def timed(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val pc = timed {
        vps.joins.SpatialJoins.pipCellJoin(points, polys, level = 7).count()
      }
      val zs = timed {
        val tiles = vps.raster.Raster.rasterize(points, zoom = 6, resolution = 16)
        vps.raster.Raster.zonalStats(tiles,
          polys.select(col("poly_id").as("zone_id"), col("geom"))).count()
      }
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      (pc, zs)
    }

    leg(4); leg(16) // JIT warm-up round (not scored)
    val effs = (1 to rounds).map { r =>
      val (pcLo, zsLo) = leg(4)
      val (pcHi, zsHi) = leg(16)
      val ePc = pcLo / pcHi / 4.0; val eZs = zsLo / zsHi / 4.0
      println(f"round $r: pipCell local[4]=$pcLo%.1f local[16]=$pcHi%.1f eff=$ePc%.2f | " +
        f"zonal local[4]=$zsLo%.1f local[16]=$zsHi%.1f eff=$eZs%.2f")
      (ePc, eZs, pcLo, pcHi, zsLo, zsHi)
    }
    val ePcs = effs.map(_._1).sorted; val eZss = effs.map(_._2).sorted
    println(f"rep=$rep rounds=$rounds: pipCell eff median=${ePcs(ePcs.length / 2)}%.2f " +
      f"best-pair=${effs.map(_._3).min / effs.map(_._4).min / 4}%.2f | " +
      f"zonal eff median=${eZss(eZss.length / 2)}%.2f " +
      f"best-pair=${effs.map(_._5).min / effs.map(_._6).min / 4}%.2f")
  }
}
