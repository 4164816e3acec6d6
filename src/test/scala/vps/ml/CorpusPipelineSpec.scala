package vps.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession
import vps.text.QualityGate

/** End-to-end composability: the four pipeline stages a training-data run
  * chains — quality gate -> exact dedup -> deterministic split -> sequence
  * packing — interoperate on their public column contracts.
  */
class CorpusPipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("gate -> dedup -> split -> pack chains end-to-end with consistent counts") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // plant one duplicate of every 10th doc so dedup has work
    val planted = docs.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 500000L).as("doc_id"), $"text")
    val corpus = docs.unionAll(planted).cache()

    // 1) quality gate: keep survivors, reasons attributable
    val gated = QualityGate.gate(corpus).where($"keep")
      .join(corpus, Seq("doc_id"))
    val kept = gated.count()
    assert(kept > 0 && kept < corpus.count())

    // 2) exact dedup: planted copies of KEPT docs collapse onto the original
    val deduped = Dedup.exactDuplicateMembership(
      gated.select($"doc_id".as("id"), $"text"))
      .where($"id" === $"keep_id") // group representatives
      .join(gated.select($"doc_id".as("id"), $"text"), Seq("id"))
    val survivors = deduped.select($"id").as[Long].collect().toSet
    assert(!survivors.exists(_ >= 500000L),
      "planted copies must never be the surviving representative (min-id keep)")

    // dedup membership only covers ids with >= 1 duplicate; standalone docs
    // pass straight through
    val dupIds = Dedup.exactDuplicateMembership(
      gated.select($"doc_id".as("id"), $"text")).select($"id").as[Long].collect().toSet
    val standalone = gated.select($"doc_id".as("id"), $"text")
      .where(!$"id".isin(dupIds.toSeq: _*))
    val corpusClean = deduped.select($"id", $"text").unionAll(standalone)

    // 3) deterministic split
    val split = Sampling.assignSplits(corpusClean, "id",
      Seq("train" -> 0.9, "val" -> 0.1))
    val n = split.count()
    assert(n === corpusClean.count())
    val train = split.where($"split" === "train")
      .withColumn("tok", vps.text.functions.token_count($"text").cast("long"))

    // 4) pack the train split
    val packed = Packing.packGreedy(train, "id", "tok", maxTokens = 256L, bucketSize = 64L)
    assert(packed.count() === train.count(), "packing emits one row per doc")
    val toks = train.select($"id", $"tok").as[(Long, Long)].collect().toMap
    packed.as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
        val total = rows.map(r => toks(r._1)).sum
        assert(total <= 256L || rows.length == 1)
      }
    corpus.unpersist()
  }
}
