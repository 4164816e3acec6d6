package vps.streaming

import java.util
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.MicroBatchStream
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** One changeset comment (nested array element). */
final case class ChangesetComment(user: String, ts: Long, text: String)

/** One changeset record — the second typed replication feed, with a schema
  * structurally distinct from the interleaved-doc stream (nested comments
  * array, nullable close time), mirroring the reference's typed `Changeset`
  * model (`model/Changeset.scala:9-23` — id/times/open/user/uid/numChanges/
  * comments).
  */
final case class ChangesetRow(
    changeset_id: Long,
    sequence: Int,
    created_at: Long,
    closed_at: Option[Long],
    open: Boolean,
    user: String,
    uid: Long,
    num_changes: Int,
    comments: Array[ChangesetComment])

/** Deterministic changeset feed: same sequence-clocked offset/clamp/resume
  * machinery as the interleaved-doc stream ([[DocMicroBatchStream]]), second
  * row shape. `spark.readStream.format("changesets")` with options `head`,
  * `batch_size`, `rows_per_sequence`; [[Changesets.frame]] is the batch
  * mirror of the same generator for relational contract checks.
  */
class ChangesetStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "changesets"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = Changesets.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenStreamTable("changesets-stream", Changesets.schema, Changesets.row)
}

object Changesets {
  val commentType: StructType = StructType(Seq(
    StructField("user", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))
  val schema: StructType = StructType(Seq(
    StructField("changeset_id", LongType, nullable = false),
    StructField("sequence", IntegerType, nullable = false),
    StructField("created_at", LongType, nullable = false),
    StructField("closed_at", LongType, nullable = true),
    StructField("open", BooleanType, nullable = false),
    StructField("user", StringType, nullable = false),
    StructField("uid", LongType, nullable = false),
    StructField("num_changes", IntegerType, nullable = false),
    StructField("comments", ArrayType(commentType, containsNull = false), nullable = false)))

  /** THE generator — one deterministic pure function of (sequence, row index);
    * the stream and the batch mirror both derive from it, and every formula is
    * integer arithmetic so a SQL oracle can recompute it.
    */
  def value(seq: Int, i: Int, rowsPerSeq: Int): ChangesetRow = {
    val id = seq.toLong * rowsPerSeq + i
    val uid = id * 7919 % 1000
    val created = 1600000000L + id * 37
    val open = id % 5 == 0
    val nComments = (id % 4).toInt
    ChangesetRow(
      changeset_id = id,
      sequence = seq,
      created_at = created,
      closed_at = if (open) None else Some(created + 3600L),
      open = open,
      user = s"user$uid",
      uid = uid,
      num_changes = (id % 100).toInt,
      comments = Array.tabulate(nComments) { k =>
        ChangesetComment(s"user${(uid + k + 1) % 1000}", created + 60L * (k + 1),
          s"comment $k on changeset $id")
      })
  }

  /** [[value]] as an InternalRow matching [[schema]] (stream path). */
  def row(seq: Int, i: Int, rowsPerSeq: Int): InternalRow = {
    val v = value(seq, i, rowsPerSeq)
    InternalRow(
      v.changeset_id, v.sequence, v.created_at,
      v.closed_at.map(Long.box).orNull, v.open,
      UTF8String.fromString(v.user), v.uid, v.num_changes,
      new GenericArrayData(v.comments.map(c =>
        InternalRow(UTF8String.fromString(c.user), c.ts, UTF8String.fromString(c.text))): Array[Any]))
  }

  /** Distributed batch mirror of `sequences * rowsPerSeq` changesets —
    * byte-equal content to draining the stream over the same range.
    */
  def frame(spark: SparkSession, sequences: Int, rowsPerSeq: Int): DataFrame = {
    implicit val enc = Encoders.product[ChangesetRow]
    spark.range(0, sequences.toLong * rowsPerSeq)
      .map(id => value((id / rowsPerSeq).toInt, (id % rowsPerSeq).toInt, rowsPerSeq))
      .toDF()
  }
}

