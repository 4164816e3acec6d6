package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved same-JVM A/B of the pack strategies (single-phase vs salted
  * sort vs salted hash-agg), at one parallelism level.
  * Usage: runMain vps.tools.PackProbe [replication] [cpus] [rounds] [zoom]
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(3000)
    val cpus = args.lift(1).map(_.toInt).getOrElse(16)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val zoom = args.lift(3).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-pack-local" else "/tmp")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 22)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = vps.docs.InterleavedDocs.fromDocuments(spark, "/root/testdata/sf0.1", rep)
    val points = vps.docs.InterleavedDocs.extractGeoSpans(docs)
      .select((col("id") * 10 + col("span_offset")).as("id"), col("geom")).persist()
    println("points=" + points.count())

    import vps.tiling.TilePipeline.PackStrategy._
    def run(strat: vps.tiling.TilePipeline.PackStrategy): Double = {
      val t0 = System.nanoTime()
      vps.tiling.TilePipeline.tileZoom(points, zoom,
        vps.tiling.TilePipeline.Options(strategy = strat)).toDF().agg(count(lit(1))).head()
      (System.nanoTime() - t0) / 1e9
    }
    val strats = Seq(SinglePhase, SaltedSort, SaltedHash)
    strats.foreach(run) // warm all
    val times = strats.map(_ -> Array.newBuilder[Double]).toMap
    (1 to rounds).foreach { r =>
      // rotate order per round + GC between runs: otherwise the strategy that
      // always follows the allocation-heavy one inherits its GC debt
      val order = strats.drop(r % strats.length) ++ strats.take(r % strats.length)
      val row = order.map { s =>
        System.gc(); Thread.sleep(1000)
        val t = run(s); times(s) += t; f"$s=$t%.2f"
      }
      println(s"round $r: ${row.mkString(" ")}")
    }
    val summary = strats.map { s =>
      val ts = times(s).result().sorted
      f"$s best=${ts.head}%.2f median=${ts(ts.length / 2)}%.2f"
    }
    println(s"cpus=$cpus rep=$rep zoom=$zoom  ${summary.mkString(" | ")}")
    spark.stop()
  }
}
