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

  test("web-curation front half: lineDedup -> domainCap -> winnow near-dup -> vocab") {
    import vps.text.{LineDedup, UrlOps, Vocab}
    val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"source",
        concat(lit("SHARED BANNER "), $"source", lit("\n"), $"text").as("text"))

    // 1) boilerplate removal: per-source banner lines (df >= 3) vanish,
    //    per-doc body lines survive
    val cleaned = LineDedup.dropBoilerplate(raw.select($"doc_id", $"text"),
        "doc_id", "text", minDocFreq = 3L)
      .join(raw.select($"doc_id", $"source"), Seq("doc_id"))
    val bannered = cleaned.where($"text".contains("SHARED BANNER")).count()
    val srcCounts = raw.groupBy($"source").count()
      .as[(String, Long)].collect().toMap
    // banners from sources with < 3 docs legitimately survive
    val smallSrcDocs = srcCounts.filter(_._2 < 3).values.sum
    assert(bannered === smallSrcDocs, s"only sub-threshold banners survive ($bannered)")
    assert(cleaned.where($"n_kept" === 0).count() === 0)

    // 2) per-domain cap (source as the domain), cap=1: exactly one doc per
    //    domain survives, chosen deterministically
    val capped = UrlOps.domainCap(cleaned, "source", "doc_id", cap = 1, salt = 3L)
    val perDomain = capped.groupBy($"source").count().as[(String, Long)].collect()
    assert(perDomain.forall(_._2 === 1L))
    val capped2 = UrlOps.domainCap(cleaned, "source", "doc_id", cap = 1, salt = 3L)
    assert(capped.select($"doc_id").as[Long].collect().toSet ===
      capped2.select($"doc_id").as[Long].collect().toSet)

    // 3) substring near-dup groups over the capped corpus + planted copies:
    //    winnow candidates -> connected components -> min-id representatives
    val planted = capped.select(($"doc_id" + 900000L).as("doc_id"),
      concat($"text", lit(" tiny suffix")).as("text"), $"source")
    val withCopies = capped.select($"doc_id", $"text", $"source").unionAll(planted)
    val cand = Dedup.winnowCandidates(
      withCopies.select($"doc_id".as("id"), $"text"), minShared = 20, maxBucket = 256)
    val comp = Components.connectedComponents(cand) // (id, component=min id)
    val groups = comp.select($"id", $"component").as[(Long, Long)].collect()
    val plantedGrouped = groups.filter(_._1 >= 900000L)
    assert(plantedGrouped.nonEmpty, "planted suffix copies must surface")
    assert(plantedGrouped.forall { case (id, rep) => rep === id - 900000L || rep < 900000L },
      "group representative is never the planted copy (min-id)")

    // 4) vocabulary over the final survivors (grouped non-representatives
    //    dropped): banner tokens are gone
    val nonReps = comp.where($"id" =!= $"component").select($"id".as("doc_id"))
    val finalCorpus = withCopies.join(nonReps, Seq("doc_id"), "left_anti")
    val vocab = Vocab.termStatsFused(finalCorpus, "text")
      .select($"term").as[String].collect().toSet
    assert(!vocab.contains("banner") || smallSrcDocs > 0)
  }
}
