package vps.text

import org.scalatest.funsuite.AnyFunSuite
import vps.SparkTestSession

class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "BANNER\nunique one\nshared ad\ntail 1"),
    (2L, "BANNER\nunique two\nshared ad"),
    (3L, "BANNER\nunique three"),
    (4L, "BANNER\nBANNER\nonly banner doc repeated"), // in-doc repeat counts once for df
    (5L, "BANNER")                                    // reduces to nothing
  ).toDF("id", "text")

  test("boilerplate df counts distinct docs, not occurrences") {
    val boiler = LineDedup.boilerplateLines(
        LineDedup.explodeLines(corpus, "id", "text"), "id", minDocFreq = 3)
      .as[(String, Long)].collect().toMap
    assert(boiler === Map("BANNER" -> 5L)) // "shared ad" df=2 < 3
  }

  test("dropBoilerplate preserves order, keeps under-threshold lines, handles emptied docs") {
    val got = LineDedup.dropBoilerplate(corpus, "id", "text", minDocFreq = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) === (("unique one\nshared ad\ntail 1", 3L, 1L)))
    assert(got(2L) === (("unique two\nshared ad", 2L, 1L)))
    assert(got(3L) === (("unique three", 1L, 1L)))
    assert(got(4L) === (("only banner doc repeated", 1L, 2L))) // both repeats dropped
    assert(got(5L) === (("", 0L, 1L)))
  }

  test("result is partitioning-independent") {
    val a = LineDedup.dropBoilerplate(corpus.repartition(1), "id", "text", 3)
      .as[(Long, String, Long, Long)].collect().toSet
    val b = LineDedup.dropBoilerplate(corpus.repartition(7, $"id"), "id", "text", 3)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("threshold above every df keeps all docs byte-identical") {
    val got = LineDedup.dropBoilerplate(corpus, "id", "text", minDocFreq = 99)
      .select($"id", $"text").as[(Long, String)].collect().toMap
    val want = corpus.as[(Long, String)].collect().toMap
    assert(got === want)
  }

  test("boilerplate filter is a broadcast anti-join (corpus side never reshuffles)") {
    val plan = LineDedup.dropBoilerplate(corpus, "id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }
}
