package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for distributed connected components: a mixed adversarial
  * graph — millions of 10-node chains (transitive resolution, O(log n)
  * rounds) plus one mega-star whose root degree equals its component size
  * (the skew case that breaks collected-neighbor-list implementations).
  * Reports wall time, rounds, edges/sec, and verifies the component
  * structure relationally (no driver-side graph walk).
  *
  * Usage: runMain vps.tools.ComponentsProbe [nChains] [starLeaves] [cpus]
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val nChains = args.headOption.map(_.toInt).getOrElse(2000000)
    val starLeaves = args.lift(1).map(_.toInt).getOrElse(1000000)
    val cpus = args.lift(2).map(_.toInt).getOrElse(16)
    val advisory = args.lift(3).getOrElse("64m")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("components-probe")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // chains: ids [c*16, c*16+9], consecutive pairs only (min = c*16)
    val chainEdges = spark.range(0, nChains.toLong * 9, 1, cpus).toDF("i")
      .select(expr("(i DIV 9) * 16 + (i % 9)").as("id_a"),
        expr("(i DIV 9) * 16 + (i % 9) + 1").as("id_b"))
    // star: leaves in a disjoint id space above the chains, hub = minimum
    val base = nChains.toLong * 16 + 16
    val starEdges = spark.range(0, starLeaves.toLong, 1, cpus).toDF("i")
      .select((col("i") * 2 + base + 1).as("id_a"), lit(base).as("id_b"))
    val edges = chainEdges.unionAll(starEdges).persist()
    val nEdges = edges.count()

    val t0 = System.nanoTime()
    val (members, rounds) = vps.ml.Components.connectedComponentsWithStats(edges)
    val stats = members.agg(
      count(lit(1)).as("nodes"),
      countDistinct(col("component")).as("components"),
      sum(when(col("component") === (col("id") - col("id") % 16) ||
        col("component") === base, 1L).otherwise(0L)).as("correct")).head()
    val sec = (System.nanoTime() - t0) / 1e9

    val nodes = stats.getLong(0)
    val comps = stats.getLong(1)
    val correct = stats.getLong(2)
    require(comps == nChains + 1L, s"components: $comps != ${nChains + 1}")
    require(nodes == nChains.toLong * 10 + starLeaves + 1, s"nodes: $nodes")
    require(correct == nodes, s"mislabeled nodes: ${nodes - correct}")
    println(f"""{"probe":"components","edges":$nEdges,"nodes":$nodes,"components":$comps,""" +
      f""""rounds":$rounds,"sec":$sec%.2f,"edges_per_sec":${nEdges / sec}%.0f}""")
    spark.stop()
  }
}
