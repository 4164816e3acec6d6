package vps.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // independent splitmix64 (constants from the published public-domain
  // reference, re-derived here rather than calling TextOps)
  private def refMix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def refUniform(id: Long, salt: Long): Double =
    (refMix(id ^ salt) >>> 11) * math.pow(2.0, -53)

  test("uniform matches the independent splitmix64 derivation exactly") {
    val ids = Seq(0L, 1L, 7L, 42L, 999999L, Long.MaxValue, -3L)
    val got = ids.toDF("id")
      .select($"id", Sampling.uniform($"id", salt = 0L).as("u0"),
        Sampling.uniform($"id", salt = 7L).as("u7"))
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    ids.foreach { id =>
      assert(got(id)._1 === refUniform(id, 0L), s"u0($id)")
      assert(got(id)._2 === refUniform(id, 7L), s"u7($id)")
      assert(got(id)._1 >= 0.0 && got(id)._1 < 1.0)
    }
  }

  test("splits are exhaustive, exclusive, deterministic under repartition, and near the fractions") {
    val n = 20000
    val df = spark.range(n).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(df, "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a.size === n) // exactly one split per row
    // identical assignment regardless of partitioning / order
    val b = Sampling.assignSplits(df.repartition(17, $"id"), "id", splits)
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(a === b)
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train").toDouble / n - 0.8) < 0.02, counts.toString)
    assert(math.abs(counts("val").toDouble / n - 0.1) < 0.015, counts.toString)
    assert(math.abs(counts("test").toDouble / n - 0.1) < 0.015, counts.toString)
    // cut points are the exact Scala cumulative sums
    val cuts = Sampling.cumulativeCuts(splits).map(_._2)
    (0L until n.toLong).foreach { id =>
      val u = refUniform(id, 0L)
      val want = if (u < cuts(0)) "train" else if (u < cuts(1)) "val" else "test"
      assert(a(id) === want, s"id=$id u=$u")
    }
  }

  test("sample is a stable subset as the corpus grows (incremental property)") {
    val small = Sampling.sample(spark.range(1000).toDF("id"), "id", 0.2, salt = 11L)
      .as[Long].collect().toSet
    val big = Sampling.sample(spark.range(5000).toDF("id"), "id", 0.2, salt = 11L)
      .as[Long].collect().toSet
    assert(small.subsetOf(big), "growing the corpus must keep every sampled id")
    assert(small === big.filter(_ < 1000))
    assert(math.abs(big.size / 5000.0 - 0.2) < 0.02)
  }

  test("sampleBy applies per-stratum fractions; unlisted strata drop") {
    val df = spark.range(30000).toDF("id")
      .withColumn("lang", when($"id" % 3 === 0, "en").when($"id" % 3 === 1, "de").otherwise("xx"))
    val got = Sampling.sampleBy(df, "lang", "id", Map("en" -> 0.5, "de" -> 0.05), salt = 3L)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(!got.contains("xx"))
    assert(math.abs(got("en") / 10000.0 - 0.5) < 0.03, got.toString)
    assert(math.abs(got("de") / 10000.0 - 0.05) < 0.02, got.toString)
    // deterministic: re-evaluation returns the same ids
    val ids1 = Sampling.sampleBy(df, "lang", "id", Map("en" -> 0.5), salt = 3L).select("id").as[Long].collect().toSet
    val ids2 = Sampling.sampleBy(df.repartition(13), "lang", "id", Map("en" -> 0.5), salt = 3L).select("id").as[Long].collect().toSet
    assert(ids1 === ids2)
  }

  test("hash_uniform keeps the hosting plan inside whole-stage codegen") {
    val plan = spark.range(100).toDF("id")
      .where(Sampling.uniform($"id", 5L) < 0.5)
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Filter"), plan)
  }
}
