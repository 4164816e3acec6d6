package vps.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import vps.text.functions.winnow_fingerprints

/** Threshold-selection probe for Dedup.winnowCandidates: shared-fingerprint
  * and containment distributions for planted suffix-copies vs word-salad
  * background at a given SF dir.
  */
object WinnowPairsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    val corpus = docs.union(docs.select(col("id") + 100000,
      concat(col("text"), lit(" tiny suffix"))))
    val sizes = corpus.select(col("id"),
      size(winnow_fingerprints(col("text"), 8, 4)).as("nfp"))
    val cand = vps.ml.Dedup.winnowCandidates(corpus, minShared = 1, maxBucket = 64)
      .join(sizes.select(col("id").as("id_a"), col("nfp").as("na")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("nfp").as("nb")), Seq("id_b"))
      .withColumn("containment", col("shared_fps") / least(col("na"), col("nb")))
    cand.persist()
    val planted = col("id_b") - col("id_a") === 100000
    println("planted containment min/max: " + cand.where(planted)
      .agg(min("containment"), max("containment"), count(lit(1))).head())
    Seq(0.5, 0.6, 0.7, 0.8).foreach { t =>
      println(s"containment>=$t: planted=" +
        cand.where(planted && col("containment") >= t).count() +
        " unplanted=" + cand.where(!planted && col("containment") >= t).count())
    }
    spark.stop()
  }
}
