package vps.streaming

import java.util
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One augmented-diff record — the THIRD typed replication feed, with the
  * nullable prev/current PAIR shape diff-consuming pipelines join on:
  * every mutable attribute appears twice (`prev_*` nullable + current), plus
  * the minor-version flag, mirroring the reference's 22-field `AugmentedDiff`
  * (`model/AugmentedDiff.scala:7-28`; reader `sources/AugmentedDiffReader
  * .scala:17-64`). Geometry rides as WKT text (the span-engine payload
  * convention) so the relational oracle can recompute it.
  *
  * Row kinds, all deterministic functions of the id:
  * - CREATE (`id % 7 == 0`): every `prev_*` field is null, version 1.
  * - MINOR edit (`id % 7 != 0 && id % 11 == 0`): geometry-only change,
  *   `prev_version == version`, `minor_version = true` (the reference flags
  *   minor versions as prev.version == curr.version).
  * - MAJOR edit (the rest): version bump; tags change iff `id % 3 == 0`;
  *   DELETE is the major edit with `visible = false` (`id % 13 == 0`).
  */
final case class DiffRow(
    sequence: Int,
    element_type: Byte,
    id: Long,
    prev_geom_wkt: Option[String],
    geom_wkt: String,
    prev_tags: Option[Map[String, String]],
    tags: Map[String, String],
    prev_nds: Option[Seq[Long]],
    nds: Seq[Long],
    prev_changeset: Option[Long],
    changeset: Long,
    prev_uid: Option[Long],
    uid: Long,
    prev_user: Option[String],
    user: String,
    prev_updated: Option[Long],
    updated: Long,
    prev_visible: Option[Boolean],
    visible: Boolean,
    prev_version: Option[Int],
    version: Int,
    minor_version: Boolean)

/** Deterministic augmented-diff feed over the shared sequence-clocked
  * offset/clamp/resume machinery ([[DocMicroBatchStream]]).
  * `spark.readStream.format("augmented-diffs")` with options `head`,
  * `batch_size`, `rows_per_sequence`; [[Diffs.frame]] is the batch mirror.
  */
class DiffStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "augmented-diffs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Diffs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenStreamTable("augmented-diffs-stream", Diffs.schema, Diffs.row)
}

object Diffs {
  private val tagsType = MapType(StringType, StringType, valueContainsNull = false)
  val schema: StructType = StructType(Seq(
    StructField("sequence", IntegerType, nullable = false),
    StructField("element_type", ByteType, nullable = false),
    StructField("id", LongType, nullable = false),
    StructField("prev_geom_wkt", StringType, nullable = true),
    StructField("geom_wkt", StringType, nullable = false),
    StructField("prev_tags", tagsType, nullable = true),
    StructField("tags", tagsType, nullable = false),
    StructField("prev_nds", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("nds", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("prev_changeset", LongType, nullable = true),
    StructField("changeset", LongType, nullable = false),
    StructField("prev_uid", LongType, nullable = true),
    StructField("uid", LongType, nullable = false),
    StructField("prev_user", StringType, nullable = true),
    StructField("user", StringType, nullable = false),
    StructField("prev_updated", LongType, nullable = true),
    StructField("updated", LongType, nullable = false),
    StructField("prev_visible", BooleanType, nullable = true),
    StructField("visible", BooleanType, nullable = false),
    StructField("prev_version", IntegerType, nullable = true),
    StructField("version", IntegerType, nullable = false),
    StructField("minor_version", BooleanType, nullable = false)))

  private def wkt(lonE4: Long, latE4: Long): String =
    // Locale.ROOT: the scala f-interpolator uses the JVM default locale, and
    // a comma-decimal locale would emit invalid WKT and non-deterministic
    // feed bytes across hosts
    String.format(java.util.Locale.ROOT, "POINT (%.4f %.4f)",
      Double.box(lonE4 / 10000.0), Double.box(latE4 / 10000.0))

  /** THE generator — a pure function of (sequence, row index) in integer
    * arithmetic so a SQL oracle can recompute every field.
    */
  def value(seq: Int, i: Int, rowsPerSeq: Int): DiffRow = {
    val id = seq.toLong * rowsPerSeq + i
    val elementType = (id % 3 + 1).toByte
    val isCreate = id % 7 == 0
    val isMinor = !isCreate && id % 11 == 0
    val version = if (isCreate) 1 else (id % 5 + 2).toInt
    val prevVersion = if (isCreate) None else Some(if (isMinor) version else version - 1)
    val changeset = id * 3 % 100000
    val uid = id * 7919 % 1000
    val updated = 1600000000L + id * 53
    val visible = id % 13 != 0
    val lonE4 = id * 9973 % 3600000 - 1800000
    val latE4 = id * 6151 % 1600000 - 800000
    val tagsChanged = !isCreate && !isMinor && id % 3 == 0
    val tags = Map(
      "kind" -> (elementType match { case 1 => "node"; case 2 => "way"; case _ => "relation" }),
      "name" -> s"n$id",
      "v" -> (id % 10).toString)
    val nds: Seq[Long] = if (elementType == 2) Seq(id, id + 1, id + 2) else Seq.empty
    DiffRow(
      sequence = seq,
      element_type = elementType,
      id = id,
      prev_geom_wkt = if (isCreate) None
        else Some(wkt((id * 9973 + 500) % 3600000 - 1800000, latE4)),
      geom_wkt = wkt(lonE4, latE4),
      prev_tags = if (isCreate) None
        else Some(if (tagsChanged) tags.updated("v", ((id + 1) % 10).toString) else tags),
      tags = tags,
      prev_nds = if (isCreate) None
        else Some(if (elementType == 2) Seq(id, id + 1) else Seq.empty),
      nds = nds,
      prev_changeset = if (isCreate) None else Some(changeset - 1),
      changeset = changeset,
      prev_uid = if (isCreate) None else Some((uid + 13) % 1000),
      uid = uid,
      prev_user = if (isCreate) None else Some(s"user${(uid + 13) % 1000}"),
      user = s"user$uid",
      prev_updated = if (isCreate) None else Some(updated - 86400L),
      updated = updated,
      prev_visible = if (isCreate) None else Some(true),
      visible = visible,
      prev_version = prevVersion,
      version = version,
      minor_version = isMinor)
  }

  private def utf(s: String): UTF8String = UTF8String.fromString(s)
  private def tagsMap(m: Map[String, String]): ArrayBasedMapData = {
    val entries = m.toSeq.sortBy(_._1) // deterministic entry order
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => utf(e._1): Any).toArray),
      new GenericArrayData(entries.map(e => utf(e._2): Any).toArray))
  }

  /** [[value]] as an InternalRow matching [[schema]] (stream path). */
  def row(seq: Int, i: Int, rowsPerSeq: Int): InternalRow = {
    val v = value(seq, i, rowsPerSeq)
    InternalRow(
      v.sequence, v.element_type, v.id,
      v.prev_geom_wkt.map(utf).orNull, utf(v.geom_wkt),
      v.prev_tags.map(tagsMap).orNull, tagsMap(v.tags),
      v.prev_nds.map(n => new GenericArrayData(n.toArray)).orNull,
      new GenericArrayData(v.nds.toArray),
      v.prev_changeset.map(Long.box).orNull, v.changeset,
      v.prev_uid.map(Long.box).orNull, v.uid,
      v.prev_user.map(utf).orNull, utf(v.user),
      v.prev_updated.map(Long.box).orNull, v.updated,
      v.prev_visible.map(Boolean.box).orNull, v.visible,
      v.prev_version.map(Int.box).orNull, v.version,
      v.minor_version)
  }

  /** Distributed batch mirror — byte-equal content to draining the stream. */
  def frame(spark: SparkSession, sequences: Int, rowsPerSeq: Int): DataFrame = {
    implicit val enc = Encoders.product[DiffRow]
    spark.range(0, sequences.toLong * rowsPerSeq)
      .map(id => value((id / rowsPerSeq).toInt, (id % rowsPerSeq).toInt, rowsPerSeq))
      .toDF()
  }
}

