package vps.media

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` + typed metadata, with
  * decode / feature-extract / frame-sample as *batched* partition-level
  * transforms (the Scala analogue of `mapInPandas`: one vectorized call per
  * batch, not per row).
  *
  * The default codec is REAL: [[ImageIoCodec]] decodes PNG/JPEG/GIF/BMP bytes
  * with JDK `javax.imageio` (no external jars), walks the actual pixel raster
  * for per-channel means + a luma histogram feature, and routes undecodable
  * bytes to an explicit error channel (`decode_ok = false`, null facts — the
  * row survives). Readers are cached per task and `ImageIO` disk caching is
  * off, so decode memory is bounded by `batchSize` x image size.
  * [[StubCodec]] remains for plumbing tests that want arbitrary `media_kind`s
  * without real bytes.
  */
object MediaPipeline {

  /** Decoded-media facts appended by [[decode]]. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("media_kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("channels", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("decode_ok", BooleanType),
    StructField("feature", ArrayType(FloatType))))

  trait MediaCodec extends Serializable {
    /** Decode a batch; one output per input (null in -> null out; undecodable
      * in -> `Decoded.failed`).
      */
    def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded]
  }
  final case class Decoded(kind: String, width: Int, height: Int, nFrames: Int,
      channels: Int, meanR: Double, meanG: Double, meanB: Double, ok: Boolean,
      feature: Array[Float])
  object Decoded {
    /** The error-channel value: decode attempted and failed. */
    val failed: Decoded = Decoded(null, 0, 0, 0, 0, 0, 0, 0, ok = false, null)
  }

  /** Deterministic fake (no real bytes): dims and a 16-dim feature derived
    * from a content hash. Plumbing tests only — [[ImageIoCodec]] is the
    * production default.
    */
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
          Decoded(kind, width, height, frames, 3,
            math.floorMod(h, 256).toDouble, math.floorMod(h >> 4, 256).toDouble,
            math.floorMod(h >> 9, 256).toDouble, ok = true, feat)
        }
      }
  }

  // ---- deterministic image synthesis (the sandbox stand-in for object
  // storage) — every parameter is a closed form of the numeric id so the
  // DuckDB oracle can recompute what the decoder must measure ----

  /** ids divisible by this get deliberately undecodable bytes (error channel). */
  val CorruptEvery = 17L
  def widthFor(id: Long): Int = 16 + math.floorMod(id * 37, 48).toInt
  def heightFor(id: Long): Int = 16 + math.floorMod(id * 53, 48).toInt
  def redFor(id: Long): Int = math.floorMod(id * 101, 256).toInt
  def greenFor(id: Long): Int = math.floorMod(id * 151, 256).toInt
  def blueFor(id: Long): Int = math.floorMod(id * 197, 256).toInt

  /** SQL fragments (over the numeric `doc_id`) for the DuckDB oracle. */
  val corruptSql = "doc_id % 17 = 0"
  val widthSql = "16 + (doc_id * 37) % 48"
  val heightSql = "16 + (doc_id * 53) % 48"
  val redSql = "(doc_id * 101) % 256"
  val greenSql = "(doc_id * 151) % 256"
  val blueSql = "(doc_id * 197) % 256"

  def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG bytes for `id` — a constant-color `widthFor x heightFor` image
    * (PNG is lossless, so the decoder's measured means equal the constants
    * exactly) — or deliberately corrupt bytes when `id % CorruptEvery == 0`.
    */
  def imageBlobFor(id: Long): Array[Byte] =
    if (math.floorMod(id, CorruptEvery) == 0L) s"NOTANIMAGE:$id".getBytes("UTF-8")
    else {
      val img = new java.awt.image.BufferedImage(
        widthFor(id), heightFor(id), java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val g2 = img.createGraphics()
      g2.setColor(new java.awt.Color(redFor(id), greenFor(id), blueFor(id)))
      g2.fillRect(0, 0, img.getWidth, img.getHeight)
      g2.dispose()
      encodePng(img)
    }

  /** Column form of [[imageBlobFor]]. */
  def synthesizeImageBlob(id: Column): Column = {
    val f = udf((i: Long) => imageBlobFor(i))
    f(id.cast("long"))
  }

  /** Legacy opaque-blob synthesizer (hash bytes; pairs with [[StubCodec]]). */
  def synthesizeBlob(ref: Column): Column = sha2(ref, 256).cast("binary")

  // ---- animated-GIF synthesis + frame sampling (the video stand-in: the JDK
  // ships no video-container codec, so multi-frame GIF is the real multi-frame
  // decode path; every per-frame fact is a closed form of (id, frame_idx) so
  // the DuckDB oracle can recompute what the sampler must measure) ----

  /** Frame count of the synthetic animated GIF for `id`: 2..8. */
  def gifFramesFor(id: Long): Int = 2 + math.floorMod(id * 29, 7).toInt
  def frameRedFor(id: Long, f: Int): Int = math.floorMod(id * 101 + f * 31L, 256).toInt
  def frameGreenFor(id: Long, f: Int): Int = math.floorMod(id * 151 + f * 57L, 256).toInt
  def frameBlueFor(id: Long, f: Int): Int = math.floorMod(id * 197 + f * 83L, 256).toInt

  /** SQL mirrors over (`doc_id`, `frame_idx`) for the DuckDB oracle. */
  val gifFramesSql = "2 + (doc_id * 29) % 7"
  val frameRedSql = "(doc_id * 101 + frame_idx * 31) % 256"
  val frameGreenSql = "(doc_id * 151 + frame_idx * 57) % 256"
  val frameBlueSql = "(doc_id * 197 + frame_idx * 83) % 256"

  /** Constant-color frame backed by an explicit 2-entry `IndexColorModel`
    * (palette index 0 = the color; raster starts zero-filled): GIF is
    * palette-based, so handing the writer an already-indexed image guarantees
    * a lossless round-trip — no quantization/dither is ever involved.
    */
  private def indexedFrame(w: Int, h: Int, r: Int, g: Int, b: Int): java.awt.image.BufferedImage = {
    val cm = new java.awt.image.IndexColorModel(8, 2,
      Array(r.toByte, 0.toByte), Array(g.toByte, 0.toByte), Array(b.toByte, 0.toByte))
    new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
  }

  /** Encode frames as one animated GIF via the JDK writer's sequence API. */
  def encodeGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Real animated-GIF bytes for `id` ([[gifFramesFor]] constant-color frames
    * of [[widthFor]]x[[heightFor]]), or deliberately corrupt bytes when
    * `id % CorruptEvery == 0` (error channel).
    */
  def gifBlobFor(id: Long): Array[Byte] =
    if (math.floorMod(id, CorruptEvery) == 0L) s"NOTAGIF:$id".getBytes("UTF-8")
    else {
      val w = widthFor(id); val h = heightFor(id)
      encodeGif((0 until gifFramesFor(id)).map(f =>
        indexedFrame(w, h, frameRedFor(id, f), frameGreenFor(id, f), frameBlueFor(id, f))))
    }

  /** Column form of [[gifBlobFor]]. */
  def synthesizeGifBlob(id: Column): Column = {
    val f = udf((i: Long) => gifBlobFor(i))
    f(id.cast("long"))
  }

  /** Per-frame facts appended by [[sampleGifFrames]] (one output row per
    * sampled frame).
    */
  val frameSchema: StructType = StructType(Seq(
    StructField("frame_idx", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("decode_ok", BooleanType)))

  /** REAL multi-frame sampling (the video frame-extraction step): decode the
    * animated GIF in `blobCol` with the JDK reader, read every `stride`-th
    * frame (index 0, stride, 2*stride, ...), and emit ONE ROW PER SAMPLED
    * FRAME with measured dims + per-channel pixel means. Only the sampled
    * frames are ever decoded — `reader.read(i)` seeks within the stream, so a
    * stride of 30 on a long animation pays for ceil(n/30) rasters, not n.
    * Null blob -> one all-null row (`decode_ok` null); undecodable bytes ->
    * one row on the error channel (`decode_ok = false`, null facts). The
    * reader is created once per partition (it is not thread-safe, and tasks
    * own partitions).
    */
  def sampleGifFrames(df: DataFrame, blobCol: String, stride: Int,
      batchSize: Int = 256): DataFrame = {
    require(stride > 0, s"sampleGifFrames: bad stride $stride")
    val outSchema = StructType(df.schema.fields ++ frameSchema.fields)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      ImageIoCodec.ensureInMemoryDecode
      val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
      val nullRow = Seq(null, null, null, null, null, null, null)
      rows.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](blobIdx)
        val frames: Seq[Seq[Any]] =
          if (bytes == null) Seq(nullRow :+ null)
          else if (!(bytes.length >= 3 && bytes(0) == 'G'.toByte &&
              bytes(1) == 'I'.toByte && bytes(2) == 'F'.toByte))
            Seq(nullRow :+ java.lang.Boolean.FALSE)
          else
            try {
              val iis = javax.imageio.ImageIO.createImageInputStream(
                new java.io.ByteArrayInputStream(bytes))
              try {
                reader.setInput(iis, false, true)
                val n = reader.getNumImages(true)
                (0 until n by stride).map { i =>
                  val img = reader.read(i)
                  val w = img.getWidth; val h = img.getHeight
                  var sr = 0L; var sg = 0L; var sb = 0L
                  val rowBuf = new Array[Int](w)
                  var y = 0
                  while (y < h) {
                    img.getRGB(0, y, w, 1, rowBuf, 0, w)
                    var x = 0
                    while (x < w) {
                      val rgb = rowBuf(x)
                      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                      x += 1
                    }
                    y += 1
                  }
                  val px = w.toLong * h
                  Seq(i, n, w, h, sr.toDouble / px, sg.toDouble / px, sb.toDouble / px,
                    java.lang.Boolean.TRUE)
                }
              } finally iis.close()
            } catch {
              case scala.util.control.NonFatal(_) => Seq(nullRow :+ java.lang.Boolean.FALSE)
            }
        frames.iterator.map(f => Row.fromSeq(row.toSeq ++ f))
      }
    }(Encoders.row(outSchema))
  }

  /** Append decoded fields. Batched: one codec call per `batchSize` rows — the
    * mapInPandas batch-shape contract. Null blob -> all-null fields (no decode
    * attempted, `decode_ok` null); undecodable blob -> null facts +
    * `decode_ok = false`.
    */
  def decode(df: DataFrame, blobCol: String, codec: MediaCodec = new ImageIoCodec,
      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ decodedSchema.fields)
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val blobs = batch.map(_.getAs[Array[Byte]](blobIdx)).toArray
        val decoded = codec.decodeBatch(blobs)
        batch.iterator.zip(decoded.iterator).map { case (row, d) =>
          if (d == null)
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null, null, null, null, null, null))
          else if (!d.ok)
            Row.fromSeq(row.toSeq ++ Seq(null, null, null, null, null, null, null, null, false, null))
          else
            Row.fromSeq(row.toSeq ++ Seq(d.kind, d.width, d.height, d.nFrames, d.channels,
              d.meanR, d.meanG, d.meanB, true, d.feature.toSeq))
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

  /** Closed-form output dims of [[resizeImages]]: scale so max(w, h) ==
    * maxDim (never upscale), floor the short side, min 1.
    */
  def resizedDims(w: Int, h: Int, maxDim: Int): (Int, Int) =
    if (w <= maxDim && h <= maxDim) (w, h)
    else if (w >= h) (maxDim, math.max(1, h * maxDim / w))
    else (math.max(1, w * maxDim / h), maxDim)

  /** REAL image resize (the training-pipeline normalization step): decode
    * with ImageIO, downscale so the long side is `maxDim` (aspect preserved,
    * floor division, never upscaled), re-encode as PNG. Appends
    * `resized_blob`, `resized_width`, `resized_height`; null or undecodable
    * input yields nulls (the decode step owns error accounting). Batched
    * per-partition like [[decode]]; Java2D bilinear, headless-safe.
    */
  def resizeImages(df: DataFrame, blobCol: String, maxDim: Int,
      batchSize: Int = 256): DataFrame = {
    require(maxDim > 0, s"resizeImages: bad maxDim $maxDim")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("resized_blob", BinaryType),
      StructField("resized_width", IntegerType),
      StructField("resized_height", IntegerType)))
    val blobIdx = df.schema.fieldIndex(blobCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val bytes = row.getAs[Array[Byte]](blobIdx)
          val resized =
            if (bytes == null) None
            else
              try {
                val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
                if (img == null) None
                else {
                  val (rw, rh) = resizedDims(img.getWidth, img.getHeight, maxDim)
                  val out =
                    if (rw == img.getWidth && rh == img.getHeight) img
                    else {
                      val scaled = new java.awt.image.BufferedImage(rw, rh,
                        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
                      val g2 = scaled.createGraphics()
                      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                      g2.drawImage(img, 0, 0, rw, rh, null)
                      g2.dispose()
                      scaled
                    }
                  Some((encodePng(out), rw, rh))
                }
              } catch { case scala.util.control.NonFatal(_) => None }
          resized match {
            case Some((b, rw, rh)) => Row.fromSeq(row.toSeq ++ Seq(b, rw, rh))
            case None => Row.fromSeq(row.toSeq ++ Seq(null, null, null))
          }
        }
      }
    }(Encoders.row(outSchema))
  }
}

/** JDK `javax.imageio` image decoder: PNG/JPEG/GIF/BMP by magic-byte sniff,
  * one cached `ImageReader` per format PER TASK (the codec instance is
  * deserialized into each task's closure, so the cache is task-scoped — no
  * cross-thread sharing of the non-thread-safe readers), in-memory
  * `ImageInputStream` (disk cache off). Emits real measurements: dimensions,
  * frame count (animated GIF > 1), color-model component count, per-channel
  * pixel means (full raster walk, row-bulk `getRGB`), and a 16-bin luma
  * histogram as the feature vector. Bytes that sniff to no known format or
  * fail to decode become [[MediaPipeline.Decoded.failed]].
  */
final class ImageIoCodec extends MediaPipeline.MediaCodec {
  import MediaPipeline.Decoded

  // one reader per format, created lazily and intentionally leaked per task
  // deserialization (bounded at 4 formats); disabling the ImageIO disk cache
  // is process-wide state, so it is set ONCE per JVM, not per image
  @transient private lazy val readers = {
    ImageIoCodec.ensureInMemoryDecode
    new java.util.HashMap[String, javax.imageio.ImageReader]()
  }

  private def formatOf(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte && b(2) == 'N'.toByte) "png"
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
    else if (b.length >= 3 && b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte) "gif"
    else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) "bmp"
    else null

  override def decodeBatch(batch: Array[Array[Byte]]): Array[Decoded] =
    batch.map { bytes =>
      if (bytes == null) null
      else {
        val fmt = formatOf(bytes)
        if (fmt == null) Decoded.failed
        else
          try {
            val reader = readers.computeIfAbsent(fmt,
              f => javax.imageio.ImageIO.getImageReadersByFormatName(f).next())
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              reader.setInput(iis, false, true)
              val nFrames =
                try { val n = reader.getNumImages(true); if (n > 0) n else 1 }
                catch { case _: Exception => 1 }
              val img = reader.read(0)
              val w = img.getWidth
              val h = img.getHeight
              var sr = 0L; var sg = 0L; var sb = 0L
              val hist = new Array[Long](16)
              val rowBuf = new Array[Int](w)
              var y = 0
              while (y < h) {
                img.getRGB(0, y, w, 1, rowBuf, 0, w)
                var x = 0
                while (x < w) {
                  val rgb = rowBuf(x)
                  val r = (rgb >> 16) & 0xff; val g = (rgb >> 8) & 0xff; val b = rgb & 0xff
                  sr += r; sg += g; sb += b
                  hist(((r * 299 + g * 587 + b * 114) / 1000) >> 4) += 1
                  x += 1
                }
                y += 1
              }
              val n = w.toLong * h
              Decoded("image", w, h, nFrames, img.getColorModel.getNumComponents,
                sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, ok = true,
                hist.map(c => (c.toDouble / n).toFloat))
            } finally iis.close()
          } catch { case scala.util.control.NonFatal(_) => Decoded.failed }
      }
    }
}

object ImageIoCodec {
  /** JVM-once side effect: the in-memory path avoids temp-file churn for the
    * small thumbnails this pipeline decodes. `lazy val` gives thread-safe
    * exactly-once initialization across all tasks in an executor.
    */
  private[media] lazy val ensureInMemoryDecode: Unit = javax.imageio.ImageIO.setUseCache(false)
}
