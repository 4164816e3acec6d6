package vps.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** N->4N thread-scaling probe for the text-pipeline operators added in the
  * q53-q55 wave (domain cap, vocab top-k, winnowing), run under the
  * established alternating-leg protocol: one JVM, local[4] and local[16]
  * legs interleaved per round, shared tmpfs corpus, BENCH-identical session
  * conf. Winnowing is the interesting one — a per-row CodegenFallback kernel
  * allocating a hash array + set per document, i.e. exactly the allocation
  * profile that killed zonal's scaling before the packed-key rework.
  *
  * Usage: runMain vps.tools.TextScaleProbe [replication] [rounds]
  */
object TextScaleProbe {
  def main(args: Array[String]): Unit = {
    val rep = args.headOption.map(_.toInt).getOrElse(100)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val base = if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val corpus = s"$base/vps_text_corpus_$rep"

    def session(cpus: Int): SparkSession = {
      val s = SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus * 2)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", 1 << 22)
        .config("spark.local.dir", s"$base/spark-text-local")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    if (!new java.io.File(s"$corpus/_SUCCESS").exists) {
      val s = session(16)
      s.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .select(col("doc_id"), col("text"), col("source"),
          explode(sequence(lit(0), lit(rep - 1))).as("r"))
        .select((col("doc_id") * rep + col("r")).as("id"), col("text"), col("source"))
        .repartition(64)
        .write.mode("overwrite").parquet(corpus)
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def leg(cpus: Int): Map[String, Double] = {
      val s = session(cpus)
      val docs = s.read.parquet(corpus)
      import vps.text.{functions => tf}
      def winnow(): Unit = {
        docs.select(tf.winnow_fingerprints(col("text"), 8, 4).as("fps"))
          .select(aggregate(col("fps"), lit(0L), (a, x) => a.bitwiseXOR(x))
            .bitwiseAND(lit(0xffffffffL)).as("x"), // mask: ANSI sum over raw xors overflows
            size(col("fps")).as("n"))
          .agg(sum(col("x")), sum(col("n"))).head()
      }
      def vocab(): Unit = { // two-exchange reference form
        vps.text.Vocab.topK(vps.text.Vocab.termStats(
          vps.text.Vocab.docTermCounts(docs, "id", "text"), "id"), 100).collect()
      }
      def vocabFused(): Unit = { // in-row per-doc rollup, one exchange
        vps.text.Vocab.topK(vps.text.Vocab.termStatsFused(docs, "text"), 100).collect()
      }
      def cap(): Unit = {
        vps.text.UrlOps.domainCap(docs.select(col("id"), col("source").as("domain")),
          "domain", "id", cap = 1000, salt = 7L).count()
      }
      winnow(); vocab(); vocabFused(); cap() // warm codegen/JIT once per leg session
      val r = Map(
        "winnow" -> time(winnow()),
        "vocab" -> time(vocab()),
        "vfused" -> time(vocabFused()),
        "cap" -> time(cap()))
      s.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      r
    }

    (1 to rounds).foreach { round =>
      val lo = leg(4)
      val hi = leg(16)
      val eff = lo.keys.toSeq.sorted.map { k =>
        f"$k: ${lo(k)}%.2f->${hi(k)}%.2f eff=${lo(k) / hi(k) / 4.0}%.2f"
      }.mkString("  ")
      println(f"round $round: $eff")
    }
  }
}
