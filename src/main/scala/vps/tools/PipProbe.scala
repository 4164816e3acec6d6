package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: pip broadcast/cell timing stability at replication 3000. */
object PipProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-pip-local" else "/tmp")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = vps.docs.InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.1", 3000)
    val points = vps.docs.InterleavedDocs.extractGeoSpans(docs)
      .select((col("id") * 10 + col("span_offset")).as("id"), col("geom")).persist()
    println("points=" + points.count())
    val polys = spark.range(0, 1000).toDF("poly_id")
      .select(col("poly_id"),
        ((col("poly_id") * 97 % 340) - 170.0).as("lon0"),
        ((col("poly_id") * 61 % 150) - 75.0).as("lat0"))
      .select(col("poly_id"), vps.sql.functions.st_geomFromWKT(format_string(
        "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
        col("lon0"), col("lat0"), col("lon0") + 15.0, col("lat0"),
        col("lon0") + 15.0, col("lat0") + 12.0, col("lon0"), col("lat0") + 12.0,
        col("lon0"), col("lat0"))).as("geom")).persist()
    polys.count()
    (1 to 4).foreach { i =>
      var t0 = System.nanoTime()
      vps.joins.SpatialJoins.pipBroadcast(points, polys).count()
      val p = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      vps.joins.SpatialJoins.pipCellJoin(points, polys, level = 7).count()
      val c = (System.nanoTime() - t0) / 1e9
      println(f"run $i: pip $p%.2f s, cell $c%.2f s")
    }
    spark.stop()
  }
}
