package vps.media

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.docs.InterleavedDocs

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media decode plumbing: schema, batching, null passthrough, determinism") {
    val docs = InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")
    val media = docs
      .select($"doc_id", explode($"spans").as("span"))
      .where($"span.kind" === "image")
      .select($"doc_id", $"span.media_ref".as("media_ref"))
      .withColumn("blob",
        when($"doc_id" === "doc7", lit(null).cast("binary")) // planted null
          .otherwise(MediaPipeline.synthesizeBlob($"media_ref")))

    val decoded = MediaPipeline.decode(media, "blob", batchSize = 64).cache()
    assert(decoded.schema.fieldNames.takeRight(5).toSeq ===
      Seq("media_kind", "width", "height", "n_frames", "feature"))
    assert(decoded.count() === 500)
    // null blob -> null decode fields
    val nullRow = decoded.where($"doc_id" === "doc7").select($"media_kind").head()
    assert(nullRow.isNullAt(0))
    // non-null rows all decoded with 16-dim features and sane dims
    val ok = decoded.where($"media_kind".isNotNull)
      .select(size($"feature") === 16 && $"width" >= 64 && $"height" >= 64 && $"n_frames" >= 1)
      .as[Boolean].collect()
    assert(ok.length === 499 && ok.forall(identity))
    // deterministic: re-run equals
    val again = MediaPipeline.decode(media, "blob", batchSize = 17) // different batch size
      .select($"doc_id", $"width", $"height")
    assert(again.except(decoded.select($"doc_id", $"width", $"height")).count() === 0)

    // frame sampling shape
    val sampled = MediaPipeline.sampleFrames(decoded.where($"media_kind".isNotNull), stride = 30)
    val video = sampled.where($"media_kind" === "video")
      .select(size($"sampled_frames") >= 1).as[Boolean].collect()
    assert(video.nonEmpty && video.forall(identity))
    decoded.unpersist()
  }
}
