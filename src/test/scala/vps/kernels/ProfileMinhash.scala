package vps.kernels

import org.apache.spark.sql.functions._
import vps.text.functions._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val near = base.select((col("id") + 100000L).as("id"),
      concat(col("text"), lit(" tiny suffix")).as("text"))
    val all = base.unionAll(near)
    println("docs=" + all.count())
    println(all.agg(avg(length(col("text"))), max(length(col("text")))).head())

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("bands only")(all.select(col("id"),
      posexplode(minhash_bands(col("text"), 64, 16, 5)).as(Seq("band", "bucket"))).count())
    val banded = all.select(col("id"), col("text"),
      posexplode(minhash_bands(col("text"), 64, 16, 5)).as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("id").as("id_a"), col("text").as("text_a"))
    val r = banded.select(col("band"), col("bucket"), col("id").as("id_b"), col("text").as("text_b"))
    val joined = l.join(r, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
    time("join")(joined.count())
    time("join+distinct")(joined.select("id_a", "id_b", "text_a", "text_b").distinct().count())
    time("full")(vps.ml.Dedup.minhashCandidates(all, minJaccard = 0.6).count())
    spark.stop()
  }
}
