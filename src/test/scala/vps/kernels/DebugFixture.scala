package vps.kernels

import org.locationtech.jts.geom._
import org.locationtech.jts.geom.prep.PreparedGeometryFactory
import vps.geom.{Geo, Wkb}

/** Scratch diagnostics for fixture parity (not a test). */
object DebugFixture {
  def sa(cs: Array[Coordinate]): Double = {
    var s = 0.0
    for (i <- 0 until cs.length - 1) s += cs(i).x * cs(i + 1).y - cs(i + 1).x * cs(i).y
    s / 2
  }
  def desc(p: Polygon): String = {
    val shell = p.getExteriorRing.getCoordinates
    f"shell[n=${shell.length} sa=${sa(shell)}%.2e env=${p.getEnvelopeInternal}] holes=${p.getNumInteriorRing}"
  }

  def main(args: Array[String]): Unit = {
    val id = if (args.nonEmpty) args(0) else "5448691"
    val spark = vps.SparkTestSession.spark
    val rows = spark.read.orc(s"/root/reference/src/test/resources/relation-$id.orc")
      .select("changeset", "id", "type", "role", "geom").collect()
    val roles = rows.map(_.getString(3)).toSeq
    val geoms = rows.map { r =>
      val b = r.getAs[Array[Byte]]("geom"); if (b == null) null else Wkb.read(b)
    }.toSeq

    val lines: Seq[(String, LineString)] = roles.zip(geoms).flatMap {
      case (role, p: Polygon)    => Some(role -> p.getExteriorRing.asInstanceOf[LineString])
      case (role, l: LineString) => Some(role -> l)
      case _                     => None
    }
    val complete = Vector.newBuilder[Polygon]
    val partial = Vector.newBuilder[LineString]
    lines.foreach { case (role, line) =>
      if (role == "outer" || role == "inner" || role == "") {
        if (line.isClosed && line.getNumPoints >= 4)
          complete += Geo.factory.createPolygon(line.getCoordinates)
        else partial += line
      }
    }
    val stitched = Segments.formRingPolygons(partial.result().sortBy(l => -l.getNumPoints))
    val rings: Seq[Polygon] = complete.result() ++ stitched
    println(s"rings=${rings.size}")
    rings.foreach(r => println("  ring " + desc(r)))

    val prep = new PreparedGeometryFactory
    val prepared = rings.map(r => (r, prep.create(r)))
    val byAreaDesc = rings.sortBy(r => -r.getArea)
    var outers = Vector(byAreaDesc.head)
    var inners = Vector.empty[Polygon]
    byAreaDesc.tail.foreach { ring =>
      val containers = prepared.count { case (r, pr) => (r ne ring) && pr.contains(ring) }
      if (containers % 2 == 0) outers :+= ring else inners :+= ring
    }
    println(s"outers=${outers.size}"); outers.foreach(r => println("  O " + desc(r)))
    println(s"inners=${inners.size}"); inners.foreach(r => println("  I " + desc(r)))

    println("-- plain union of outers:")
    val u = Geo.factory.createGeometryCollection(outers.toArray[Geometry]).union()
    (0 until u.getNumGeometries).map(u.getGeometryN(_).asInstanceOf[Polygon]).foreach { p =>
      println("  U " + desc(p))
      (0 until p.getNumInteriorRing).foreach { i =>
        val h = p.getInteriorRingN(i).getCoordinates
        println(f"    hole n=${h.length} sa=${sa(h)}%.2e")
      }
    }
    val innerShells = inners.map(p => Geo.factory.createPolygon(p.getExteriorRing.getCoordinates))
    println("-- plain union of innerShells (no addl):")
    if (innerShells.nonEmpty) {
      val u2 = Geo.factory.createGeometryCollection(innerShells.toArray[Geometry]).union()
      (0 until u2.getNumGeometries).foreach { i =>
        u2.getGeometryN(i) match {
          case p: Polygon => println("  U2 " + desc(p))
          case g => println("  U2 other " + g.getGeometryType)
        }
      }
    }

    // experiment: what flips the addlInners in the inner dissolve?
    val bigU = (0 until u.getNumGeometries).map(u.getGeometryN(_).asInstanceOf[Polygon]).maxBy(_.getNumPoints)
    val addl = (0 until bigU.getNumInteriorRing).map(i =>
      Geo.factory.createPolygon(bigU.getInteriorRingN(i).getCoordinates))
    println("-- addlInners:")
    addl.foreach(p => println("  A " + desc(p)))
    if (addl.size == 2) {
      println("envIntersects=" + addl(0).getEnvelopeInternal.intersects(addl(1).getEnvelopeInternal))
      val u3 = Geo.factory.createGeometryCollection(addl.toArray[Geometry]).union()
      println("-- plain union of addl:")
      (0 until u3.getNumGeometries).foreach(i => println("  U3 " + desc(u3.getGeometryN(i).asInstanceOf[Polygon])))
      val u4 = org.locationtech.jts.operation.union.CascadedPolygonUnion.union(
        scala.jdk.CollectionConverters.SeqHasAsJava(addl).asJava)
      println("-- CascadedPolygonUnion of addl:")
      (0 until u4.getNumGeometries).foreach(i => println("  U4 " + desc(u4.getGeometryN(i).asInstanceOf[Polygon])))
    }
    spark.stop()
  }
}
