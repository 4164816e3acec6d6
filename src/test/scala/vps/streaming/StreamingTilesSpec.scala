package vps.streaming

import org.scalatest.funsuite.AnyFunSuite
import vps.SparkTestSession
import vps.mvt.Mvt

class StreamingTilesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stream -> extract -> tile -> sink produces decodable per-batch tile trees") {
    val out = java.nio.file.Files.createTempDirectory("streamtiles").toString
    val ckpt = java.nio.file.Files.createTempDirectory("streamtiles-ckpt").toString
    val q = StreamingTiles.start(spark, out, ckpt, zoom = 3,
      sourceOptions = Map("head" -> "4", "batch_size" -> "2", "rows_per_sequence" -> "50"))
    try q.processAllAvailable() finally q.stop()

    val batchDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch-")).sortBy(_.getName)
    assert(batchDirs.length === 2) // 4 sequences / batch_size 2
    var totalFeatures = 0L
    batchDirs.foreach { bd =>
      val mvts = new java.io.File(bd, "3").listFiles().flatMap(_.listFiles())
        .filter(f => f.getName.endsWith(".mvt") && !f.getName.startsWith("."))
      assert(mvts.nonEmpty, s"${bd.getName}: no tiles")
      mvts.foreach { f =>
        val tile = Mvt.decode(java.nio.file.Files.readAllBytes(f.toPath))
        totalFeatures += tile.layers.head.features.size
      }
      // lineage committed per batch
      assert(new java.io.File(bd, "_lineage/z3").listFiles().nonEmpty)
    }
    // one geo span per streamed doc: 4 sequences x 50 rows
    assert(totalFeatures === 200L)
  }
}
