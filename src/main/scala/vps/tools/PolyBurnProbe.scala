package vps.tools

import vps.geom.{TileMath, Wkt}
import vps.raster.Raster

/** Plain-JVM A/B for the polygon/line burn kernels: scanline+candidates
  * ([[Raster.burnScan]]) vs the per-cell reference ([[Raster.burnPerCell]])
  * on a tile-filling polygon, a star polygon (long perimeter), and a long
  * diagonal line, at increasing grid resolutions. Byte-equality is asserted
  * per case before timing.
  *
  * Usage: runMain vps.tools.PolyBurnProbe [maxRes] [reps]
  */
object PolyBurnProbe {
  def main(args: Array[String]): Unit = {
    val maxRes = args.headOption.map(_.toInt).getOrElse(1024)
    val reps = args.lift(1).map(_.toInt).getOrElse(20)
    val env = TileMath.tileEnvelopeLatLng(3, 4, 3)
    val w = env.getWidth; val h = env.getHeight
    val x0 = env.getMinX; val y0 = env.getMinY
    def pt(fx: Double, fy: Double) = s"${x0 + fx * w} ${y0 + fy * h}"
    // ~80%-cover irregular polygon with a hole
    val big = Wkt.read(
      s"POLYGON ((${pt(0.05, 0.1)}, ${pt(0.9, 0.05)}, ${pt(0.95, 0.85)}, ${pt(0.4, 0.95)}, " +
        s"${pt(0.08, 0.7)}, ${pt(0.05, 0.1)}), " +
        s"(${pt(0.3, 0.3)}, ${pt(0.6, 0.35)}, ${pt(0.5, 0.6)}, ${pt(0.3, 0.3)}))")
    // 64-point star: perimeter-heavy
    val starPts = (0 until 64).map { k =>
      val a = 2 * math.Pi * k / 64
      val r = if (k % 2 == 0) 0.45 else 0.18
      pt(0.5 + r * math.cos(a), 0.5 + r * math.sin(a))
    }
    val star = Wkt.read("POLYGON ((" + (starPts :+ starPts.head).mkString(", ") + "))")
    val line = Wkt.read(s"LINESTRING (${pt(0.02, 0.03)}, ${pt(0.5, 0.9)}, ${pt(0.97, 0.1)})")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); (0 until reps).foreach(_ => f); (System.nanoTime() - t0) / 1e9 / reps
    }
    Seq(128, 256, maxRes).distinct.foreach { res =>
      Seq("big" -> big, "star" -> star, "line" -> line).foreach { case (name, g) =>
        val a = new Array[Double](res * res); Raster.burnScan(g, 1.0, env, res, a)
        val b = new Array[Double](res * res); Raster.burnPerCell(g, 1.0, env, res, b)
        require(java.util.Arrays.equals(a, b), s"$name@$res not byte-identical")
        val tScan = time { Raster.burnScan(g, 1.0, env, res, new Array[Double](res * res)) }
        val tCell = time { Raster.burnPerCell(g, 1.0, env, res, new Array[Double](res * res)) }
        println(f"$name%5s res=$res%5d  scan=${tScan * 1000}%9.2f ms  percell=${tCell * 1000}%9.2f ms  speedup=${tCell / tScan}%6.1fx")
      }
    }
  }
}
