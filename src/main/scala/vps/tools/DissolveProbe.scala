package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import vps.sql.functions._

/** Cost-shape probe for [[vps.sql.StUnionAgg]] on an adversarial MEGA
  * dissolve group: n disjoint unit boxes, ONE group. A linear
  * accumulate-and-collapse re-walks the growing accumulated union every
  * BatchSize inputs (O(n^2/BatchSize) vertex work); a size-tiered
  * (binomial-counter) collapse restores cascaded-union O(n log n).
  * The probe doubles n and reports sec + sec/n so the shape is readable
  * directly: ~constant sec/n = linear, growing sec/n = super-linear.
  *
  * Usage: runMain vps.tools.DissolveProbe [maxN] [doublings] [cpus]
  */
object DissolveProbe {
  def main(args: Array[String]): Unit = {
    val maxN = args.headOption.map(_.toInt).getOrElse(100000)
    val doublings = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = args.lift(2).map(_.toInt).getOrElse(16)
    vps.geom.Geo.registerUDTs()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("dissolve-probe")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // n disjoint 0.8x0.8 boxes on a sqrt(n) grid — one dissolve group. Output
    // is a MultiPolygon with exactly n components; area checks n * 0.64.
    def boxes(n: Int) = {
      val side = math.ceil(math.sqrt(n.toDouble)).toInt
      val bx = (col("id") % side).cast("long")
      val by = floor(col("id") / side).cast("long")
      spark.range(0, n, 1, cpus).toDF("id")
        .select(st_geomFromWKT(
          format_string("POLYGON((%d %d, %d.8 %d, %d.8 %d.8, %d %d.8, %d %d))",
            bx, by, bx, by, bx, by, bx, by, bx, by)).as("geom"))
    }

    def leg(n: Int): (Double, Double, Int) = {
      val df = boxes(n).persist(); df.count()
      val t0 = System.nanoTime()
      val row = df.agg(st_union_agg(col("geom")).as("g"))
        .select(st_area(col("g")).as("area"), st_numGeometries(col("g")).as("parts"))
        .head()
      val sec = (System.nanoTime() - t0) / 1e9
      df.unpersist()
      require(row.getInt(1) == n, s"expected $n components, got ${row.getInt(1)}")
      require(math.abs(row.getDouble(0) - n * 0.64) < 1e-6, s"area mismatch: ${row.getDouble(0)}")
      (sec, sec / n * 1e6, n)
    }

    leg(maxN >> doublings) // warm
    println(f"${"n"}%8s ${"sec"}%8s ${"us/box"}%8s")
    (doublings to 0 by -1).foreach { d =>
      val (sec, perN, n) = leg(maxN >> d)
      println(f"$n%8d $sec%8.2f $perN%8.2f")
    }
    spark.stop()
  }
}
