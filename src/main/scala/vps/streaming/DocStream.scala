package vps.streaming

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Micro-batch streaming source for interleaved documents — the Spark 4
  * `MicroBatchStream` re-expression of the reference's replication readers
  * (`sources/ReplicationStreamMicroBatchReader.scala:21-216`,
  * `SequenceOffset.scala:4-18`):
  *
  * - the clock is a monotonically increasing *sequence* number; one
  *   InputPartition per sequence (reference S7)
  * - offset negotiation clamps each batch to `batch_size` sequences past the
  *   current start, never beyond the remote head (reference S9)
  * - the remote feed is a deterministic generator (`head` option; zero egress),
  *   pure function of (sequence, row index) — same interleaved-doc shape as
  *   [[vps.docs.InterleavedDocs]]
  *
  * Options: `head` (latest available sequence, default 10), `batch_size`
  * (sequences per micro-batch, default 4), `rows_per_sequence` (default 100).
  *
  * Usage: `spark.readStream.format("interleaved-docs").option(...).load()`
  */
class DocStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "interleaved-docs"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = DocStream.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GenStreamTable("interleaved-docs-stream", DocStream.schema, DocStream.row)
}

object DocStream {
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = true),
    StructField("media_ref", StringType, nullable = true),
    StructField("offset", IntegerType, nullable = false)))
  val schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("sequence", IntegerType, nullable = false),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false)))

  /** Deterministic doc for (sequence, row): same span layout as InterleavedDocs. */
  def row(seq: Int, i: Int, rowsPerSeq: Int): InternalRow = {
    val id = seq.toLong * rowsPerSeq + i
    val lon = (id * 9973L % 3600000L) / 10000.0 - 180.0
    val lat = (id * 6151L % 1600000L) / 10000.0 - 80.0
    def span(kind: String, text: String, ref: String, off: Int): InternalRow =
      InternalRow(UTF8String.fromString(kind),
        if (text == null) null else UTF8String.fromString(text),
        if (ref == null) null else UTF8String.fromString(ref),
        off)
    val spans = new GenericArrayData(Array[Any](
      span("text", s"synthetic doc $id from sequence $seq", null, 0),
      span("geo", String.format(java.util.Locale.ROOT, "POINT (%.4f %.4f)", // locale-proof WKT
        Double.box(lon), Double.box(lat)), null, 1),
      span("image", null, s"img://$id", 2)))
    InternalRow(UTF8String.fromString(s"doc$id"), seq, spans)
  }
}

/** Shared DSv2 table for every sequence-clocked generator feed: reads the
  * common `head`/`batch_size`/`rows_per_sequence` options and wires the
  * feed's row generator into [[DocMicroBatchStream]] — a new typed feed is
  * one provider + one schema + one pure generator function.
  */
class GenStreamTable(tableName: String, tableSchema: StructType,
    gen: (Int, Int, Int) => InternalRow) extends Table with SupportsRead {
  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val head = options.getInt("head", 10)
    val batchSize = options.getInt("batch_size", 4)
    val rowsPerSeq = options.getInt("rows_per_sequence", 100)
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = tableSchema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new DocMicroBatchStream(head, batchSize, rowsPerSeq, gen)
      }
    }
  }
}

/** Ordered sequence offset, JSON `{"sequence":N}` (reference S8 shape). */
case class SequenceOffset(sequence: Int) extends Offset {
  override def json(): String = s"""{"sequence":$sequence}"""
}

/** Sequence-clocked micro-batch stream shared by every typed feed: the
  * offset/clamp/partition machinery is feed-agnostic; `gen(seq, i, rowsPerSeq)`
  * supplies the rows (must be a deterministic pure function — resume replays
  * it).
  */
class DocMicroBatchStream(head: Int, batchSize: Int, rowsPerSeq: Int,
    gen: (Int, Int, Int) => InternalRow)
    extends MicroBatchStream with SupportsAdmissionControl {
  override def initialOffset(): Offset = SequenceOffset(0)

  /** Clamp to min(remote head, start + batch_size) — reference S9, via the
    * admission-control hook so the committed end offset equals what was read.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SequenceOffset].sequence
    SequenceOffset(math.min(head, s + batchSize))
  }
  override def reportLatestOffset(): Offset = SequenceOffset(head)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException("admission-control latestOffset is used")

  override def deserializeOffset(json: String): Offset =
    SequenceOffset(json.split("\"sequence\":")(1).split("}")(0).trim.toInt)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SequenceOffset].sequence
    val e = end.asInstanceOf[SequenceOffset].sequence // already clamped by latestOffset
    // one partition per sequence; deterministic seeded shuffle of the work units
    // so adjacent (similar-sized) sequences spread across tasks (reference S6)
    val seqs = (s until e).toArray
    val rnd = new scala.util.Random(42)
    val shuffled = rnd.shuffle(seqs.toSeq).toArray
    shuffled.map(seq => DocStreamPartition(seq, rowsPerSeq): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val g = gen // local copy: the lambda must not capture the (non-serializable) stream
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[DocStreamPartition]
      new PartitionReader[InternalRow] {
        private var i = -1
        override def next(): Boolean = { i += 1; i < p.rowsPerSeq }
        override def get(): InternalRow = g(p.sequence, i, p.rowsPerSeq)
        override def close(): Unit = ()
      }
    }
  }

  override def commit(end: Offset): Unit = () // engine checkpoints offsets
  override def stop(): Unit = ()
}

case class DocStreamPartition(sequence: Int, rowsPerSeq: Int) extends InputPartition
