package vps.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level scaling diagnosis for the two headline workloads whose N->4N
  * reads ~0.5 (pip-cell, zonal) while their siblings read 0.75-0.95: runs
  * each workload at local[4] and local[16] (alternating, one JVM, shared
  * tmpfs corpus, BENCH-identical session conf incl. the ObjectHashAggregate
  * fallback threshold) and prints PER-STAGE wall / task-time / cpu / GC /
  * shuffle bytes, so the non-scaling stage is named instead of guessed.
  *
  * Usage: runMain vps.tools.ScaleDiagProbe [replication] [rounds]
  */
object ScaleDiagProbe {
  final case class StageRow(id: Int, name: String, tasks: Int, wallMs: Long,
      runMs: Long, cpuMs: Long, gcMs: Long, shufWriteMB: Double, shufReadMB: Double)

  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(3000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(2)
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val corpus = s"$base/vps_alt_corpus_$rep" // shared with AltTilesProbe/AltScaleProbe

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 22)
        .config("spark.local.dir", s"$base/spark-alt-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    if (!new java.io.File(s"$corpus/_SUCCESS").exists) {
      val s = session(16)
      vps.docs.InterleavedDocs.extractGeoSpans(
        vps.docs.InterleavedDocs.fromDocuments(s, "/root/testdata/sf0.1", rep))
        .select((col("id") * 10 + col("span_offset")).as("id"), col("geom"))
        .write.mode("overwrite").parquet(corpus)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def leg(cpus: Int, print: Boolean): Unit = {
      val s = session(cpus)
      vps.geom.Geo.registerUDTs()
      val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
      val listener = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val tm = si.taskMetrics
          val wall = (for {a <- si.completionTime; b <- si.submissionTime} yield a - b).getOrElse(-1L)
          stages.add(StageRow(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
            wall, tm.executorRunTime, tm.executorCpuTime / 1000000, tm.jvmGCTime,
            tm.shuffleWriteMetrics.bytesWritten / 1e6, tm.shuffleReadMetrics.totalBytesRead / 1e6))
        }
      }
      val points = s.read.parquet(corpus).persist()
      points.count()
      val polys = s.range(0, 1000).toDF("poly_id")
        .select(col("poly_id"),
          ((col("poly_id") * 97 % 340) - 170.0).as("lon0"),
          ((col("poly_id") * 61 % 150) - 75.0).as("lat0"))
        .select(col("poly_id"), vps.sql.functions.st_geomFromWKT(format_string(
          "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
          col("lon0"), col("lat0"), col("lon0") + 15.0, col("lat0"),
          col("lon0") + 15.0, col("lat0") + 12.0, col("lon0"), col("lat0") + 12.0,
          col("lon0"), col("lat0"))).as("geom"))
        .persist()
      polys.count()

      def timed(label: String)(f: => Unit): Unit = {
        // warm shot (JIT/codegen/broadcast), then the measured shot with the listener
        f
        stages.clear()
        s.sparkContext.addSparkListener(listener)
        val t0 = System.nanoTime(); f; val sec = (System.nanoTime() - t0) / 1e9
        s.sparkContext.removeSparkListener(listener)
        // poll until the final stage-completed event lands (listener bus is async)
        Thread.sleep(200)
        if (print) {
          println(f"== $label cpus=$cpus total=$sec%.2f s")
          stages.toArray(Array.empty[StageRow]).sortBy(_.id).foreach { r =>
            println(f"   stage ${r.id}%4d tasks=${r.tasks}%3d wall=${r.wallMs}%6d ms run=${r.runMs}%7d cpu=${r.cpuMs}%7d gc=${r.gcMs}%5d sw=${r.shufWriteMB}%8.1f MB sr=${r.shufReadMB}%8.1f MB  ${r.name}")
          }
        }
      }

      timed("scanOnly") {
        // pure persisted-corpus scan + cheap codegen expr: the scaling
        // baseline every other workload's map side sits on
        points.agg(sum(vps.sql.functions.st_x(col("geom")))).collect()
      }
      timed("scanCellOld") {
        // scan + interpreted tile_keys + explode (the rasterize/tiles map
        // side's generator pipeline) + scalar agg — no grids, no row shuffle:
        // isolates the explode pipeline's thread-scaling
        points.select(col("geom"), explode(vps.sql.functions.tile_keys(col("geom"), 6)).as("k"))
          .agg(sum(col("k.x"))).collect()
      }
      timed("scanCellPacked") {
        // scan + the packed-key codegen projection (rasterizePoints' map
        // side) + scalar agg — the allocation-free equivalent
        import org.apache.spark.sql.vps.ColumnBridge.{column => cbb, expression => exx}
        points.select(cbb(vps.raster.GridPointKey(
            exx(col("geom")), 6, 16)).as("pk"))
          .agg(sum(col("pk").bitwiseAND(0xFFFFFFL))).collect() // cell part only: sum of full keys overflows Long
      }
      timed("pipIds") {
        vps.joins.SpatialJoins.pipBroadcastIds(points, polys).count()
      }
      timed("pipCell") {
        vps.joins.SpatialJoins.pipCellJoin(points, polys, level = 7).count()
      }
      timed("zonal") {
        val tiles = vps.raster.Raster.rasterize(points, zoom = 6, resolution = 16)
        vps.raster.Raster.zonalStats(tiles,
          polys.select(col("poly_id").as("zone_id"), col("geom"))).count()
      }
      timed("zonalPart") {
        val tiles = vps.raster.Raster.rasterizePoints(points, zoom = 6, resolution = 16)
        vps.raster.Raster.zonalStats(tiles,
          polys.select(col("poly_id").as("zone_id"), col("geom"))).count()
      }
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    leg(16, print = false) // JIT warm-up, not scored
    (1 to rounds).foreach { _ => leg(4, print = true); leg(16, print = true) }
  }
}
