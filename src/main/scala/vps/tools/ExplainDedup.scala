package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: q15-shaped minhash timing stability at sf0.1. */
object ExplainDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32)
      .select(col("doc_id").as("id"), col("text"))
    val near = base.select((col("id") + 100000L).as("id"),
      concat(col("text"), lit(" tiny suffix")).as("text"))
    val texts = base.unionAll(near)
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      val n = vps.ml.Dedup.minhashCandidates(texts, minJaccard = 0.6).count()
      println(f"run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
