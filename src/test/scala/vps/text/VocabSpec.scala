package vps.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class VocabSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the cat  sat"),          // double space -> empty token dropped
    (2L, "The cat ran"),           // case-folds onto 'the'/'cat'
    (3L, "dog dog dog the")
  ).toDF("doc_id", "text")

  test("docTermCounts: per-(doc,term) tf with lowercasing and empty drop") {
    val got = Vocab.docTermCounts(corpus, "doc_id", "text")
      .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, "the")) === 1L)
    assert(got((2L, "the")) === 1L)
    assert(got((3L, "dog")) === 3L)
    assert(got.size === 8) // (1,the)(1,cat)(1,sat)(2,the)(2,cat)(2,ran)(3,dog)(3,the)
  }

  test("termStats + topK: df/tf_total, full tie-break order, 1-based rank") {
    val top = Vocab.topK(Vocab.termStats(
        Vocab.docTermCounts(corpus, "doc_id", "text"), "doc_id"), 10)
      .select($"term", $"df", $"tf_total", $"rank")
      .as[(String, Long, Long, Long)].collect()
    // the: df=3 tf=3 | cat: df=2 tf=2 | dog: df=1 tf=3 | ran,sat: df=1 tf=1 (term asc)
    assert(top.map(_._1).toSeq === Seq("the", "cat", "dog", "ran", "sat"))
    assert(top.map(_._4).toSeq === (1L to 5L))
    assert(top(0) === (("the", 3L, 3L, 1L)))
    assert(top(2) === (("dog", 1L, 3L, 3L)))
  }

  test("topK limits before ranking (k smaller than vocabulary)") {
    val top2 = Vocab.topK(Vocab.termStats(
        Vocab.docTermCounts(corpus, "doc_id", "text"), "doc_id"), 2)
      .select($"term", $"rank").as[(String, Long)].collect()
    assert(top2.toSeq === Seq(("the", 1L), ("cat", 2L)))
  }

  test("tfidf matches the hand-computed smoothed formula") {
    val dt = Vocab.docTermCounts(corpus, "doc_id", "text")
    val stats = Vocab.termStats(dt, "doc_id")
    val got = Vocab.tfidf(dt, stats, nDocs = 3L)
      .select($"doc_id", $"term", $"tfidf")
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    def expect(tf: Long, df: Long): Double =
      tf * (math.log(3.0 / (1.0 + df)) + 1.0)
    assert(got((3L, "dog")) === expect(3, 1))
    assert(got((1L, "the")) === expect(1, 3))
    assert(got((2L, "cat")) === expect(1, 2))
  }

  test("termStatsFused equals the two-exchange form (incl. double spaces, case folds, repeats)") {
    val a = Vocab.termStats(Vocab.docTermCounts(corpus, "doc_id", "text"), "doc_id")
      .as[(String, Long, Long)].collect().toSet
    val b = Vocab.termStatsFused(corpus, "text")
      .as[(String, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("termStatsFused has exactly one exchange (the term rollup)") {
    val plan = Vocab.termStatsFused(corpus, "text")
      .queryExecution.executedPlan.toString.split("Initial Plan")(0)
    val n = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(n === 1, s"expected 1 exchange, got $n:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = Vocab.topK(Vocab.termStats(
        Vocab.docTermCounts(corpus, "doc_id", "text"), "doc_id"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
