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

  test("boilerplate filter is a broadcast anti-join when the set is small " +
      "(AQE runtime size, no forced hint)") {
    val df = LineDedup.dropBoilerplate(corpus, "id", "text", 3)
    df.collect() // finalize AQE: the gate reads the boiler side's REAL bytes
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
  }

  test("over-threshold fallback: shuffled anti-join path is byte-identical") {
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    // force the boiler side over every broadcast threshold: the planner must
    // take the shuffled anti-join (the 100-TB path, where the df>=minDocFreq
    // line set outgrows the driver) and produce the identical result
    keys.foreach(spark.conf.set(_, "-1"))
    try {
      val df = LineDedup.dropBoilerplate(corpus, "id", "text", 3)
      val got = df.as[(Long, String, Long, Long)].collect().toSet
      df.queryExecution.executedPlan // materialized above
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan)
      assert(plan.contains("LeftAnti"), plan)
      val want = Set(
        (1L, "unique one\nshared ad\ntail 1", 3L, 1L),
        (2L, "unique two\nshared ad", 2L, 1L),
        (3L, "unique three", 1L, 1L),
        (4L, "only banner doc repeated", 1L, 2L),
        (5L, "", 0L, 1L))
      assert(got === want)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
