package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N vs 4N scaling probe for connected components under the tight protocol:
  * legs ALTERNATE local[4]/local[16] round-robin inside one JVM (JIT shared,
  * host drift cancels within a round), reading a pre-materialized edge list
  * from tmpfs parquet so every leg scans identical input. Graph is the
  * [[ComponentsProbe]] adversarial mix — millions of 10-node chains (O(log n)
  * transitive rounds) plus one mega-star (hub degree = component size).
  *
  * Usage: runMain vps.tools.AltCcProbe [nChains] [starLeaves] [rounds]
  */
object AltCcProbe {
  def main(args: Array[String]): Unit = {
    val nChains = args.headOption.map(_.toInt).getOrElse(2000000)
    val starLeaves = args.lift(1).map(_.toInt).getOrElse(1000000)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val corpus = s"$base/vps_cc_edges_${nChains}_$starLeaves"

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.local.dir", s"$base/spark-alt-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    if (!new java.io.File(s"$corpus/_SUCCESS").exists) {
      val s = session(16)
      val chainEdges = s.range(0, nChains.toLong * 9, 1, 16).toDF("i")
        .select(expr("(i DIV 9) * 16 + (i % 9)").as("id_a"),
          expr("(i DIV 9) * 16 + (i % 9) + 1").as("id_b"))
      val b = nChains.toLong * 16 + 16
      val starEdges = s.range(0, starLeaves.toLong, 1, 16).toDF("i")
        .select((col("i") * 2 + b + 1).as("id_a"), lit(b).as("id_b"))
      chainEdges.unionAll(starEdges).write.mode("overwrite").parquet(corpus)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def leg(cpus: Int): Double = {
      val s = session(cpus)
      val edges = s.read.parquet(corpus).persist()
      edges.count()
      val t0 = System.nanoTime()
      val (members, _) = vps.ml.Components.connectedComponentsWithStats(edges)
      val n = members.agg(count(lit(1))).head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      require(n == nChains.toLong * 10 + starLeaves + 1, s"nodes: $n")
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      sec
    }

    leg(4); leg(16) // JIT warm-up round (not scored)
    val effs = (1 to rounds).map { r =>
      val lo = leg(4)
      val hi = leg(16)
      val eff = lo / hi / 4.0
      println(f"round $r: local[4]=$lo%.1f s local[16]=$hi%.1f s  efficiency=$eff%.2f")
      (lo, hi, eff)
    }
    val los = effs.map(_._1).sorted; val his = effs.map(_._2).sorted
    val es = effs.map(_._3).sorted
    val edges = nChains.toLong * 9 + starLeaves
    println(f"cc edges=$edges rounds=$rounds: " +
      f"local[4] best=${los.head}%.1f median=${los(los.length / 2)}%.1f | " +
      f"local[16] best=${his.head}%.1f median=${his(his.length / 2)}%.1f " +
      f"(${edges / his.head}%.0f edges/s best) | " +
      f"efficiency median=${es(es.length / 2)}%.2f best-pair=${los.head / his.head / 4}%.2f")
  }
}
