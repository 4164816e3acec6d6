package vps.tiling

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.Dataset

/** MVT file-tree sink `<dir>/<z>/<x>/<y>.mvt` with per-partition lineage +
  * metrics and idempotent resume (reference S13/S14 + the north rule's
  * "resumable from checkpoint with per-partition lineage").
  *
  * Each task writes its tiles then commits `_lineage/z<zoom>/part-<pid>.json`
  * via temp + atomic rename. A re-run sees the committed lineage record and
  * skips the partition entirely, so interrupted jobs resume where they stopped;
  * tile bytes are deterministic (features id-sorted), so a partial overwrite is
  * byte-identical.
  *
  * Lineage records carry a two-part fingerprint — the job's partition count
  * AND an order-independent hash of the partition's tile-key set: a re-run
  * with a different parallelism/AQE layout maps tiles to different partition
  * ids, and a re-run whose layout matches but whose input changed maps
  * DIFFERENT tiles to the same partition id; in both cases the stale record
  * must not suppress the partition — on any mismatch it rewrites and
  * re-commits.
  */
object TileSink {

  final case class PartitionLineage(
      zoom: Int, partition: Int, tiles: Long, features: Long, bytes: Long, parts: Int,
      keysig: Long)

  def write(tiles: Dataset[TilePipeline.TileRow], dir: String): Seq[PartitionLineage] = {
    val spark = tiles.sparkSession
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val out = dir

    // pin ONE physical layout: the fingerprint below must describe the same
    // partitioning the tasks actually run with
    val rdd = tiles.rdd
    val nParts = rdd.getNumPartitions

    rdd.mapPartitions { rows =>
      val pid = TaskContext.getPartitionId()
      val conf = hadoopConf.value
      val fs = new Path(out).getFileSystem(conf)
      val buffered = rows.toArray
      if (buffered.isEmpty) Iterator.empty
      else {
        val zoom = buffered.head.zoom
        // order-independent fingerprint of the partition's (tile key, tile
        // CONTENT) set: a resume only skips when the layout (parts), the
        // exact tiles this partition carries, AND their encoded bytes all
        // match the committed record. Folding the content hash in closes the
        // case where an input edit changes tile bytes without changing which
        // tiles land in the partition — that now rewrites instead of keeping
        // stale .mvt output. (The content hash is FNV-1a over bytes the
        // partition already holds in memory — noise next to the MVT encode.)
        var keysig = 0L
        buffered.foreach { t =>
          var h = 0xcbf29ce484222325L // FNV-1a 64 over the tile bytes
          var i = 0
          while (i < t.mvt.length) { h = (h ^ (t.mvt(i) & 0xffL)) * 0x100000001b3L; i += 1 }
          keysig ^= vps.text.TextOps.mix64(
            ((t.zoom.toLong << 58) ^ (t.x.toLong << 29) ^ t.y.toLong) ^ vps.text.TextOps.mix64(h))
        }
        val lineagePath = new Path(s"$out/_lineage/z$zoom/part-$pid.json")
        val prior: Option[PartitionLineage] =
          if (fs.exists(lineagePath)) {
            val in = fs.open(lineagePath)
            val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
            Some(parseLineage(txt))
          } else None
        prior match {
          case Some(rec) if rec.parts == nParts && rec.keysig == keysig =>
            // committed by a previous run under the SAME layout: skip (resume)
            Iterator.single(rec)
          case _ =>
            // no record, or a record from a different partition layout (stale)
            var nTiles = 0L; var nFeatures = 0L; var nBytes = 0L
            buffered.foreach { t =>
              val p = new Path(f"$out/${t.zoom}/${t.x}/${t.y}.mvt")
              fs.mkdirs(p.getParent)
              val tmp = new Path(p.getParent, s".${t.y}.mvt.tmp-$pid")
              val os = fs.create(tmp, true)
              try os.write(t.mvt) finally os.close()
              fs.delete(p, false)
              if (!fs.rename(tmp, p)) throw new java.io.IOException(s"rename failed for $p")
              nTiles += 1; nFeatures += t.features; nBytes += t.mvt.length
            }
            val rec = PartitionLineage(zoom, pid, nTiles, nFeatures, nBytes, nParts, keysig)
            val tmp = new Path(s"$out/_lineage/z$zoom/.part-$pid.tmp")
            fs.mkdirs(tmp.getParent)
            val os = fs.create(tmp, true)
            try os.write(lineageJson(rec).getBytes("UTF-8")) finally os.close()
            fs.delete(lineagePath, false)
            if (!fs.rename(tmp, lineagePath)) throw new java.io.IOException(s"lineage commit failed: $lineagePath")
            Iterator.single(rec)
        }
      }
    }.collect().toSeq
  }

  private def lineageJson(r: PartitionLineage): String =
    s"""{"zoom":${r.zoom},"partition":${r.partition},"tiles":${r.tiles},"features":${r.features},"bytes":${r.bytes},"parts":${r.parts},"keysig":${r.keysig}}"""

  private def parseLineage(s: String): PartitionLineage = {
    def field(n: String, default: Long = -1L): Long =
      if (s.contains("\"" + n + "\":")) s.split("\"" + n + "\":")(1).split("[,}]")(0).toLong
      else default
    // a record without keysig (older format) never matches -> safe rewrite
    PartitionLineage(field("zoom").toInt, field("partition").toInt,
      field("tiles"), field("features"), field("bytes"), field("parts").toInt,
      field("keysig", Long.MinValue))
  }
}
