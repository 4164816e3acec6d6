package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import vps.text.functions._

/** Scratch profiler for the minhash-LSH stages (not part of the library API). */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); a
    }
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .repartition(32)
      .select(col("doc_id").as("id"), col("text"))
    val near = base.select((col("id") + 100000L).as("id"),
      concat(col("text"), lit(" tiny suffix")).as("text"))
    val texts = base.unionAll(near).cache()
    println("docs: " + texts.count())

    val banded = texts.select(col("id"),
      posexplode(minhash_bands(col("text"), 64, 16, 5)).as(Seq("band", "bucket"))).cache()
    time("bands")(banded.count())

    val bstats = banded.groupBy("band", "bucket").count()
    println(time("bucket stats")(
      bstats.agg(max("count"), expr("sum(count*(count-1)/2)")).head()))

    val pairs = banded.as("l").join(banded.as("r"),
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket")
          && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
    val distinctPairs = time("pairs distinct")(pairs.distinct().cache())
    println("distinct pairs: " + distinctPairs.count())

    val joined = distinctPairs
      .join(texts.select(col("id").as("id_a"), col("text").as("text_a")), Seq("id_a"))
      .join(texts.select(col("id").as("id_b"), col("text").as("text_b")), Seq("id_b"))
    time("verify")(joined
      .withColumn("jaccard", ngram_jaccard(col("text_a"), col("text_b"), 5))
      .where(col("jaccard") >= 0.6).count())
    spark.stop()
  }
}
