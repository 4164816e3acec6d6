package vps.media

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.docs.InterleavedDocs

class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("media decode plumbing: schema, batching, null passthrough, determinism (stub codec)") {
    val docs = InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")
    val media = docs
      .select($"doc_id", explode($"spans").as("span"))
      .where($"span.kind" === "image")
      .select($"doc_id", $"span.media_ref".as("media_ref"))
      .withColumn("blob",
        when($"doc_id" === "doc7", lit(null).cast("binary")) // planted null
          .otherwise(MediaPipeline.synthesizeBlob($"media_ref")))

    val decoded = MediaPipeline.decode(media, "blob", MediaPipeline.StubCodec, batchSize = 64).cache()
    assert(decoded.schema.fieldNames.takeRight(10).toSeq ===
      Seq("media_kind", "width", "height", "n_frames", "channels",
        "mean_r", "mean_g", "mean_b", "decode_ok", "feature"))
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
    val again = MediaPipeline.decode(media, "blob", MediaPipeline.StubCodec, batchSize = 17)
      .select($"doc_id", $"width", $"height")
    assert(again.except(decoded.select($"doc_id", $"width", $"height")).count() === 0)

    // frame sampling shape
    val sampled = MediaPipeline.sampleFrames(decoded.where($"media_kind".isNotNull), stride = 30)
    val video = sampled.where($"media_kind" === "video")
      .select(size($"sampled_frames") >= 1).as[Boolean].collect()
    assert(video.nonEmpty && video.forall(identity))
    decoded.unpersist()
  }

  test("ImageIoCodec decodes real PNG bytes: exact dims, channels, pixel means; corrupt -> error channel") {
    val docs = InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.001")
    val media = docs.select($"doc_id", $"id", explode($"spans").as("span"))
      .where($"span.kind" === "image")
      .select($"doc_id", $"id")
      .withColumn("blob",
        when($"id" === 7L, lit(null).cast("binary")) // planted null alongside the % 17 corrupt rows
          .otherwise(MediaPipeline.synthesizeImageBlob($"id")))
    val decoded = MediaPipeline.decode(media, "blob", new ImageIoCodec, batchSize = 64)
      .select($"id", $"media_kind", $"width", $"height", $"channels",
        $"mean_r", $"mean_g", $"mean_b", $"decode_ok")
      .collect()
    assert(decoded.length === 500)
    decoded.foreach { r =>
      val id = r.getLong(0)
      if (id == 7L) assert(r.isNullAt(1) && r.isNullAt(8)) // null blob: no decode attempted
      else if (id % MediaPipeline.CorruptEvery == 0) {
        assert(!r.getBoolean(8) && r.isNullAt(1) && r.isNullAt(2)) // error channel
      } else {
        assert(r.getString(1) === "image" && r.getBoolean(8))
        assert(r.getInt(2) === MediaPipeline.widthFor(id))
        assert(r.getInt(3) === MediaPipeline.heightFor(id))
        assert(r.getInt(4) === 3)
        assert(r.getDouble(5) === MediaPipeline.redFor(id).toDouble)
        assert(r.getDouble(6) === MediaPipeline.greenFor(id).toDouble)
        assert(r.getDouble(7) === MediaPipeline.blueFor(id).toDouble)
      }
    }
  }

  test("ImageIoCodec measures real pixels: gradient PNG means match an independent sum; JPEG/GIF/BMP decode; garbage fails") {
    // horizontal red gradient + constant green/blue: mean must equal the
    // independently computed per-channel average, proving a real raster walk
    val w = 40; val h = 10
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    (0 until h).foreach(y => (0 until w).foreach { x =>
      img.setRGB(x, y, new java.awt.Color(x * 255 / (w - 1), 30, 200).getRGB)
    })
    val expectedR = (0 until w).map(x => x * 255 / (w - 1)).sum.toDouble / w
    val codec = new ImageIoCodec

    val png = MediaPipeline.encodePng(img)
    val Array(d) = codec.decodeBatch(Array(png))
    assert(d.ok && d.width === w && d.height === h)
    assert(math.abs(d.meanR - expectedR) < 1e-9)
    assert(d.meanG === 30.0 && d.meanB === 200.0)
    assert(math.abs(d.feature.map(_.toDouble).sum - 1.0) < 1e-6) // histogram fractions

    // other ImageIO formats round-trip through the same codec (JPEG is lossy:
    // dims exact, means approximate)
    Seq("jpg", "gif", "bmp").foreach { fmt =>
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), s"ImageIO cannot write $fmt")
      val Array(dd) = codec.decodeBatch(Array(out.toByteArray))
      assert(dd.ok && dd.width === w && dd.height === h, s"format $fmt")
      assert(math.abs(dd.meanB - 200.0) < 16.0, s"format $fmt meanB ${dd.meanB}")
    }

    // garbage and truncated bytes hit the error channel, not an exception
    val Array(g1, g2, n1) = codec.decodeBatch(Array(
      "definitely not an image".getBytes, png.take(20), null))
    assert(!g1.ok && !g2.ok && n1 == null)
  }
}
