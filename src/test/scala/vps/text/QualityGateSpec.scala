package vps.text

import org.scalatest.funsuite.AnyFunSuite
import vps.SparkTestSession

class QualityGateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val en20 = "the cat and the dog went to the park and it was good for all of them that day ok"

  private def reasons(rows: (Long, String)*): Map[Long, (String, Boolean)] =
    QualityGate.gate(rows.toDF("doc_id", "text"))
      .as[(Long, String, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("each rule fires with its own reason; passing docs keep") {
    val got = reasons(
      1L -> en20,                                    // 21 en tokens, clean
      2L -> "the cat sat",                           // too_short
      3L -> ("word " * 95).trim,                     // 95 tokens, but repetitive fires first? no — order: short/long/rep
      4L -> "el perro y el gato de la casa en la calle por un para los del las y el dia es que bueno si",
      5L -> (en20 + " mail me at someone@example.com ok")) // pii-dense for its length
    assert(got(1L) === ("ok", true))
    assert(got(2L) === ("too_short", false))
    // doc 3 is 95 tokens of one repeated word: rule ORDER says too_long wins
    // only above 90 tokens — 95 > 90, and too_long precedes repetitive
    assert(got(3L) === ("too_long", false))
    assert(got(4L) === ("lang", false))
    assert(got(5L)._1 === "pii")
  }

  test("first-failing order: a short non-English doc reports too_short, not lang") {
    val got = reasons(1L -> "el gato")
    assert(got(1L) === ("too_short", false))
  }

  test("repetitive text between the token bounds is dropped as repetitive") {
    // 30 tokens of the same word: token bounds pass, 5-gram repetition ~1
    val got = reasons(1L -> ("the cat " * 15).trim)
    assert(got(1L) === ("repetitive", false))
  }
}
