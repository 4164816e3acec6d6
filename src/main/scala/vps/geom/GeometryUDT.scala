package vps.geom

import org.apache.spark.sql.types.{BinaryType, DataType, UDTRegistration, UserDefinedType}
import org.locationtech.jts.geom._
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/** WKB-backed Catalyst [[UserDefinedType]] for JTS [[Geometry]].
  *
  * Plays the role GeoMesa's `AbstractGeometryUDT` plays in the reference
  * (`/root/reference/src/main/scala/vectorpipe/VectorPipe.scala:90-92` requires the
  * geometry column to be a UDT). Backed by WKB bytes so geometry values flow through
  * Tungsten/whole-stage-codegen rows without Kryo (the reference needs Kryo only
  * because it hops to RDDs; we never do).
  */
class GeometryUDT extends UserDefinedType[Geometry] {
  override def sqlType: DataType = BinaryType
  override def serialize(g: Geometry): Any =
    if (g == null) null else Wkb.write(g)
  override def deserialize(datum: Any): Geometry = datum match {
    case null            => null
    case b: Array[Byte]  => Wkb.read(b)
    case g: Geometry     => g
  }
  override def userClass: Class[Geometry] = classOf[Geometry]
  override def typeName: String = "geometry"
  override def pyUDT: String = ""
  override def equals(o: Any): Boolean = o.isInstanceOf[GeometryUDT]
  override def hashCode(): Int = classOf[GeometryUDT].getName.hashCode
}

object GeometryUDT {
  /** Schema-embeddable instance: must be the plain class (codegen reconstructs
    * the UDT by class name and chokes on the `object`'s `$` class).
    */
  val Instance: GeometryUDT = new GeometryUDT
}

/** Thread-local WKB/WKT codecs (JTS readers/writers are not thread-safe). */
object Wkb {
  private val reader = ThreadLocal.withInitial[WKBReader](() => new WKBReader(Geo.factory))
  private val writer = ThreadLocal.withInitial[WKBWriter](() => new WKBWriter(2))
  def read(b: Array[Byte]): Geometry = reader.get().read(b)
  def write(g: Geometry): Array[Byte] = writer.get().write(g)

  /** Read a geometry for a TRANSIENT predicate probe: plain 2-D point WKB (21
    * bytes, either byte order) mutates and returns `reuse` — zero allocations
    * on the point-probe hot path (a candidate-pair refine evaluates this per
    * pair; the allocation stream, not the arithmetic, is what stops scaling
    * on shared-memory hosts). Anything else takes the full parse. The caller
    * must not retain the returned geometry beyond the predicate call (JTS
    * predicates read the coordinates and keep nothing).
    */
  def readProbe(b: Array[Byte], reuse: Point): Geometry = {
    if (b.length == 21) {
      val bb = java.nio.ByteBuffer.wrap(b)
      if (b(0) == 1) bb.order(java.nio.ByteOrder.LITTLE_ENDIAN)
      if (bb.getInt(1) == 1) {
        val c = reuse.getCoordinate
        c.x = bb.getDouble(5)
        c.y = bb.getDouble(13)
        reuse.geometryChanged() // drop the cached envelope
        return reuse
      }
    }
    read(b)
  }
}

object Wkt {
  private val reader = ThreadLocal.withInitial[WKTReader](() => new WKTReader(Geo.factory))
  private val writer = ThreadLocal.withInitial[WKTWriter](() => new WKTWriter(2))
  def read(s: String): Geometry = reader.get().read(s)
  def write(g: Geometry): String = writer.get().write(g)
}

/** Shared geometry factory + UDT registration. */
object Geo {
  val factory: GeometryFactory = new GeometryFactory(new PrecisionModel(), 4326)

  /** Register the UDT for JTS Geometry and every concrete subclass, so
    * `Encoder`s over case classes with geometry fields resolve. Idempotent.
    */
  def registerUDTs(): Unit = synchronized {
    val udt = classOf[GeometryUDT].getName
    Seq(
      classOf[Geometry], classOf[Point], classOf[LineString], classOf[LinearRing],
      classOf[Polygon], classOf[MultiPoint], classOf[MultiLineString],
      classOf[MultiPolygon], classOf[GeometryCollection]
    ).foreach { c =>
      if (!UDTRegistration.exists(c.getName)) UDTRegistration.register(c.getName, udt)
    }
  }

  def point(x: Double, y: Double): Point = factory.createPoint(new Coordinate(x, y))

  /** Axis-aligned rectangle polygon (CCW shell). */
  def box(xmin: Double, ymin: Double, xmax: Double, ymax: Double): Polygon =
    factory.createPolygon(Array(
      new Coordinate(xmin, ymin), new Coordinate(xmax, ymin),
      new Coordinate(xmax, ymax), new Coordinate(xmin, ymax),
      new Coordinate(xmin, ymin)))
}
