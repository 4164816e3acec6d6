package vps.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import vps.sql.functions._

/** A/B probe for the pipCellJoin refine predicate: content-hash prepared
  * cache (`st_intersects`, hashes the full polygon WKB per candidate pair)
  * vs poly_id-keyed instance cache (`st_intersects_keyed`, O(1) probe).
  * Polygons are many-vertex rings (where the per-pair WKB hash actually
  * costs something — the 5-point bench boxes understate it). Alternating
  * legs in ONE JVM, 2 warm-ups, median-of-rounds (the round-2/3 host-noise
  * protocol).
  *
  * Usage: runMain vps.tools.PipRefineProbe [nPoints] [nPolys] [vertices] [rounds] [cpus]
  */
object PipRefineProbe {
  def main(args: Array[String]): Unit = {
    val nPoints = args.headOption.map(_.toInt).getOrElse(2000000)
    val nPolys = args.lift(1).map(_.toInt).getOrElse(40)
    val vertices = args.lift(2).map(_.toInt).getOrElse(400)
    val rounds = args.lift(3).map(_.toInt).getOrElse(5)
    val cpus = args.lift(4).map(_.toInt).getOrElse(16)
    vps.geom.Geo.registerUDTs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("pip-refine-probe")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic point cloud
    val pts = spark.range(0, nPoints, 1, cpus).toDF("id")
      .select(col("id"), st_point(
        (col("id") * 9973 % 3600000) / 10000.0 - 180.0,
        (col("id") * 6151 % 1600000) / 10000.0 - 80.0).as("geom"))
      .persist()
    pts.count()

    // many-vertex near-circular polygons (radius 8 deg)
    val polyWkts = (0 until nPolys).map { i =>
      val cx = (i * 97 % 340) - 170.0 + 8.0
      val cy = (i * 61 % 150) - 75.0 + 6.0
      val ring = (0 to vertices).map { v =>
        val a = 2 * math.Pi * (v % vertices) / vertices
        String.format(java.util.Locale.ROOT, "%.6f %.6f", // comma-decimal locales break WKT
          Double.box(cx + 8.0 * math.cos(a)), Double.box(cy + 5.0 * math.sin(a)))
      }.mkString(", ")
      (i.toLong, s"POLYGON (($ring))")
    }
    import spark.implicits._
    val polys = polyWkts.toDF("poly_id", "wkt")
      .select(col("poly_id"), st_geomFromWKT(col("wkt")).as("geom"))
      .persist()
    polys.count()

    val level = 6
    def joined(): DataFrame = {
      val p = pts.withColumn("_cell", cell_at(st_x(col("geom")), st_y(col("geom")), level))
      val pl = polys.select(col("poly_id"), col("geom").as("_poly_geom"))
        .withColumn("_cell", explode(cells_of(col("_poly_geom"), level)))
      p.join(pl, Seq("_cell"))
    }
    def legContent(): Long =
      joined().where(st_intersects(col("_poly_geom"), col("geom"))).count()
    def legKeyed(): Long =
      joined().where(st_intersects_keyed(col("poly_id"), col("_poly_geom"), col("geom"))).count()

    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
    }
    // warm both
    val (na, _) = time(legContent()); val (nb, _) = time(legKeyed())
    require(na == nb, s"row counts differ: $na vs $nb")
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    (1 to rounds).foreach { r =>
      // alternate leg order per round (GC-debt rotation)
      if (r % 2 == 1) { as += time(legContent())._2; bs += time(legKeyed())._2 }
      else { bs += time(legKeyed())._2; as += time(legContent())._2 }
      System.gc()
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println(f"""{"probe":"pip_refine","points":$nPoints,"polys":$nPolys,"vertices":$vertices,"hits":$na,""" +
      f""""content_hash_median_sec":${med(as.toSeq)}%.3f,"keyed_median_sec":${med(bs.toSeq)}%.3f,""" +
      f""""content_runs":${as.map(s => f"$s%.2f").mkString("[", ",", "]")},"keyed_runs":${bs.map(s => f"$s%.2f").mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
