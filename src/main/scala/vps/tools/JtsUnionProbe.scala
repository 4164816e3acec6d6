package vps.tools

import org.locationtech.jts.geom._
import org.locationtech.jts.operation.union.UnaryUnionOp

/** Plain-JTS (no Spark) cost-shape probe behind [[DissolveProbe]]: which JTS
  * primitive is super-linear on n disjoint boxes — the one-shot cascaded
  * union, the binary union of two halves (the tier-carry op), or `norm()`?
  *
  * Usage: runMain vps.tools.JtsUnionProbe [maxN]
  */
object JtsUnionProbe {
  val gf = new GeometryFactory()
  def box(x: Double, y: Double): Geometry =
    gf.createPolygon(Array(new Coordinate(x, y), new Coordinate(x + 0.8, y),
      new Coordinate(x + 0.8, y + 0.8), new Coordinate(x, y + 0.8), new Coordinate(x, y)))
  def boxes(n: Int, xOff: Int = 0): java.util.List[Geometry] = {
    val side = math.ceil(math.sqrt(n.toDouble)).toInt
    val l = new java.util.ArrayList[Geometry](n)
    (0 until n).foreach(i => l.add(box(i % side + xOff, i / side)))
    l
  }
  def time(f: => Any): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }

  def main(a: Array[String]): Unit = {
    val maxN = a.headOption.map(_.toInt).getOrElse(50000)
    val ns = Seq(maxN / 4, maxN / 2, maxN)
    ns.foreach { n =>
      val bs = boxes(n)
      val t = time(UnaryUnionOp.union(bs))
      println(f"unary   n=$n%7d  $t%7.2f s  ${t / n * 1e6}%7.2f us/box")
    }
    ns.foreach { n =>
      val l = UnaryUnionOp.union(boxes(n))
      val side = math.ceil(math.sqrt(n.toDouble)).toInt
      val r = UnaryUnionOp.union(boxes(n, side + 2))
      val t = time(l.union(r))
      println(f"binary  n=$n%7d+$n%d  $t%7.2f s  ${t / n * 1e6}%7.2f us/box")
    }
    ns.foreach { n =>
      val u = UnaryUnionOp.union(boxes(n))
      val t = time(u.norm())
      println(f"norm    n=$n%7d  $t%7.2f s  ${t / n * 1e6}%7.2f us/box")
    }
  }
}
