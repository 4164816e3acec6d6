package vps.ml

import org.scalatest.funsuite.AnyFunSuite
import vps.SparkTestSession
import vps.text.TextOps

class DecontamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val evalSpan = "XYZQWERTYUIOPASDFGHJ" // 20 chars -> 8 distinct 13-grams

  test("training docs sharing a 13-gram span are flagged with the exact distinct-overlap count") {
    val eval = Seq(evalSpan).toDF("text")
    val train = Seq(
      (1L, s"left padding then $evalSpan and a tail"), // contains the span verbatim
      (2L, "completely unrelated content with no overlap at all"),
      (3L, evalSpan) // the eval doc itself in the corpus
    ).toDF("id", "text")
    val got = Decontam.contaminatedDocs(train, eval)
      .as[(Long, Long)].collect().toMap
    assert(got(1L) === 8L, "20-char verbatim span = 8 distinct 13-grams")
    assert(got(3L) === 8L)
    assert(!got.contains(2L), "clean doc must be absent")
  }

  test("overlap counting is distinct (a repeated leaked span counts once per gram)") {
    val eval = Seq(evalSpan).toDF("text")
    val train = Seq((1L, s"$evalSpan ... $evalSpan")).toDF("id", "text")
    val got = Decontam.contaminatedDocs(train, eval).as[(Long, Long)].collect().toMap
    assert(got(1L) === 8L)
  }

  test("matches an independent shingle-set intersection") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank"
    val b = "a different text where the quick brown fox jumps again elsewhere"
    val want = TextOps.sortedShingles(a, 13).toSet
      .intersect(TextOps.sortedShingles(b, 13).toSet).size.toLong
    assert(want > 0, "fixture must actually overlap")
    val got = Decontam.contaminatedDocs(
      Seq((7L, a)).toDF("id", "text"), Seq(b).toDF("text"))
      .as[(Long, Long)].collect().toMap
    assert(got(7L) === want)
  }
}
