package vps.mvt

import java.io.ByteArrayOutputStream

/** Minimal protobuf wire-format primitives — just what the public Mapbox Vector
  * Tile 2.1 spec needs (varint, zigzag, length-delimited, 32-bit float).
  * Written from scratch against the protobuf encoding docs; no protobuf-java on
  * the classpath (SURVEY.md env facts).
  */
object Wire {
  final val Varint = 0
  final val Fixed64 = 1
  final val LenDelim = 2
  final val Fixed32 = 5

  def tag(fieldNo: Int, wireType: Int): Int = (fieldNo << 3) | wireType

  def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)
  def zigzag32(v: Int): Int = (v << 1) ^ (v >> 31)
  def unzigzag32(v: Int): Int = (v >>> 1) ^ -(v & 1)
}

final class PbWriter(initial: Int = 256) {
  private val out = new ByteArrayOutputStream(initial)

  def writeVarint(v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  def writeTag(fieldNo: Int, wireType: Int): Unit = writeVarint(Wire.tag(fieldNo, wireType).toLong)

  def writeVarintField(fieldNo: Int, v: Long): Unit = { writeTag(fieldNo, Wire.Varint); writeVarint(v) }

  def writeBytesField(fieldNo: Int, b: Array[Byte]): Unit = {
    writeTag(fieldNo, Wire.LenDelim); writeVarint(b.length.toLong); out.write(b, 0, b.length)
  }

  def writeStringField(fieldNo: Int, s: String): Unit =
    writeBytesField(fieldNo, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def writeFloatField(fieldNo: Int, f: Float): Unit = {
    writeTag(fieldNo, Wire.Fixed32)
    val bits = java.lang.Float.floatToIntBits(f)
    out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
    out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
  }

  def writeDoubleField(fieldNo: Int, d: Double): Unit = {
    writeTag(fieldNo, Wire.Fixed64)
    var bits = java.lang.Double.doubleToLongBits(d)
    var i = 0
    while (i < 8) { out.write((bits & 0xff).toInt); bits >>>= 8; i += 1 }
  }

  /** Packed repeated uint32 (the MVT geometry/tags fields). */
  def writePackedVarints(fieldNo: Int, vs: Iterable[Long]): Unit = {
    if (vs.nonEmpty) {
      val inner = new PbWriter(vs.size * 2)
      vs.foreach(inner.writeVarint)
      writeBytesField(fieldNo, inner.toBytes)
    }
  }

  def toBytes: Array[Byte] = out.toByteArray
}

final class PbReader(buf: Array[Byte], start: Int, end: Int) {
  def this(buf: Array[Byte]) = this(buf, 0, buf.length)
  private var pos = start

  def hasNext: Boolean = pos < end

  def readVarint(): Long = {
    var shift = 0
    var result = 0L
    var b = 0
    do {
      b = buf(pos) & 0xff; pos += 1
      result |= (b & 0x7fL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    result
  }

  /** Returns (fieldNo, wireType). */
  def readTag(): (Int, Int) = {
    val t = readVarint().toInt
    (t >>> 3, t & 0x7)
  }

  def readBytes(): (Array[Byte], Int, Int) = {
    val len = readVarint().toInt
    val r = (buf, pos, pos + len)
    pos += len
    r
  }

  def readString(): String = {
    val (b, s, e) = readBytes()
    new String(b, s, e - s, java.nio.charset.StandardCharsets.UTF_8)
  }

  def readFloat(): Float = {
    val bits = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
      ((buf(pos + 2) & 0xff) << 16) | ((buf(pos + 3) & 0xff) << 24)
    pos += 4
    java.lang.Float.intBitsToFloat(bits)
  }

  def readDouble(): Double = {
    var bits = 0L
    var i = 0
    while (i < 8) { bits |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
    pos += 8
    java.lang.Double.longBitsToDouble(bits)
  }

  def skip(wireType: Int): Unit = wireType match {
    case Wire.Varint   => readVarint()
    case Wire.Fixed64  => pos += 8
    case Wire.LenDelim => val len = readVarint().toInt; pos += len
    case Wire.Fixed32  => pos += 4
    case other         => throw new IllegalArgumentException(s"unsupported wire type $other")
  }
}
