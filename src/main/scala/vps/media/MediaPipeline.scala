package vps.media

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata, with
  * decode / feature-extract / resize / frame-sample as *batched* partition-level
  * transforms (the Scala analogue of `mapInPandas`: one vectorized call per
  * batch, not per row).
  *
  * The actual codec is STUBBED (no image/audio libs in this container —
  * [[StubCodec]] synthesizes deterministic pixels/samples from the bytes); the
  * Spark-side contract — schema, batch shape, partitioning, null passthrough —
  * is real and tested. Swap [[MediaCodec]] for a JNI/ImageIO-backed impl on a
  * real cluster.
  */
object MediaPipeline {

  /** Decoded-media facts appended by [[decode]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("feature", ArrayType(FloatType))))

  trait MediaCodec extends Serializable {
    /** Decode a batch; one output per input (null in -> null fields out). */
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded]
  }
  final case class Decoded(kind: String, width: Int, height: Int, nFrames: Int, feature: Array[Float])

  /** Deterministic fake: dims and a 16-dim feature derived from the bytes. */
  object StubCodec extends MediaCodec {
    override def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
      batch.map { bytes =>
        if (bytes == null) null
        else {
          var h = 1469598103934665603L
          bytes.foreach(b => { h = (h ^ (b & 0xff)) * 1099511628211L })
          val kind = (math.floorMod(h, 3) match {
            case 0 => "image"; case 1 => "audio"; case _ => "video"
          })
          val width = 64 + math.floorMod(h >> 8, 512).toInt
          val height = 64 + math.floorMod(h >> 16, 512).toInt
          val frames = if (kind == "video") 1 + math.floorMod(h >> 24, 300).toInt else 1
          val feat = Array.tabulate(16)(i =>
            (math.floorMod(h >> (i * 3), 1000) / 1000.0f) - 0.5f)
          Decoded(kind, width, height, frames, feat)
        }
      }
  }

  /** Synthesize an opaque media blob column from a media_ref (deterministic —
    * the sandbox stand-in for fetching bytes from object storage).
    */
  def synthesizeBlob(ref: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sha2(ref, 256).cast("binary")

  /** Append decoded fields. Batched: one codec call per `batchSize` rows — the
    * mapInPandas batch-shape contract.
    */
  def decode(df: DataFrame, blobCol: String, codec: MediaCodec = StubCodec,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedSchema.fields)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val blobs = batch.map(_.getAs[Array[Byte]](blobIdx)).toArray
        val decoded = codec.decodeBatch(blobs)
        batch.iterator.zip(decoded.iterator).map { case (row, d) =>
          if (d == null) Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null))
          else Row.fromSeq(row.toSeq ++ Seq(d.kind, d.width, d.height, d.nFrames, d.feature.toSeq))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling plan for video rows: every `stride`-th frame index. */
  def sampleFrames(df: DataFrame, stride: Int): DataFrame =
    df.withColumn("sampled_frames",
      when(col("media_kind") === "video",
        sequence(lit(0), col("n_frames") - 1, lit(stride)))
        .otherwise(array(lit(0))))
}
