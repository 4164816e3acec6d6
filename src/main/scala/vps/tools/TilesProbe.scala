package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: tiles-only N vs 4N at a given replication, one JVM, fused path. */
object TilesProbe {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(3000)
    def leg(cpus: Int): Double = {
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.local.dir",
          if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-tp-local" else "/tmp")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 22) // hash-agg tile pack (see TilePipeline)
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val docs = vps.docs.InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.1", rep)
      val points = vps.docs.InterleavedDocs.extractGeoSpans(docs)
        .select((col("id") * 10 + col("span_offset")).as("id"), col("geom")).persist()
      points.count()
      def run(): Double = {
        val t0 = System.nanoTime()
        vps.tiling.TilePipeline.tileZoom(points, 8).toDF().agg(count(lit(1))).head()
        (System.nanoTime() - t0) / 1e9
      }
      run(); run()
      val best = (1 to 3).map(_ => run()).min
      println(f"cpus=$cpus rep=$rep best=$best%.2f")
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      best
    }
    val lo = leg(4); val hi = leg(16)
    println(f"rep=$rep: $lo%.2f -> $hi%.2f  speedup ${lo / hi}%.2f  eff ${lo / hi / 4}%.2f")
  }
}
