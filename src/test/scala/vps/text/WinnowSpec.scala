package vps.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class WinnowSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent brute-force winnowing: recompute every window's rightmost
    * unsigned argmin from the shared k-gram hashes, no incremental tricks.
    */
  private def refWinnow(s: String, k: Int, w: Int): Set[Long] = {
    val hs = TextOps.charShingles(s, k)
    if (hs.isEmpty) return Set.empty
    val starts = 0 to math.max(hs.length - w, 0)
    starts.map { ws =>
      val window = hs.slice(ws, math.min(ws + w, hs.length))
      // rightmost unsigned min
      window.zipWithIndex.minBy { case (h, i) =>
        (new java.math.BigInteger(java.lang.Long.toUnsignedString(h)), -i)
      }._1
    }.toSet
  }

  test("winnow matches the brute-force reference on varied texts") {
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away home",
      "aaaaaaaaaaaaaaaaaaaaaaaa", // degenerate: all k-grams identical
      "abcabcabcabcabcabcabcabc", // period-3 repetition
      "short",                    // shorter than k -> empty
      "exactly8!",                // barely above k
      (0 until 500).map(i => ('a' + (i * 7 % 26)).toChar).mkString)
    for (t <- texts; (k, w) <- Seq((8, 4), (5, 9), (4, 2))) {
      val got = TextOps.winnow(t, k, w).toSet
      assert(got === refWinnow(t, k, w), s"text='${t.take(20)}...' k=$k w=$w")
    }
  }

  test("fingerprints are sorted, distinct, and a subset of the k-gram hashes") {
    val t = "the quick brown fox jumps over the lazy dog again and again and again"
    val fps = TextOps.winnow(t, 8, 4)
    assert(fps.toSeq === fps.sorted.toSeq)
    assert(fps.distinct.length === fps.length)
    assert(fps.toSet.subsetOf(TextOps.charShingles(t, 8).toSet))
  }

  test("guarantee: docs sharing a substring of length >= k+w-1 share a fingerprint") {
    val shared = "zqxjkvbwpfmg hydra unique substring block"  // len 41 >= 11
    val a = "left padding text before " + shared + " and trailing content here"
    val b = "completely different prefix " + shared + " other tail words follow"
    val fa = TextOps.winnow(a, 8, 4).toSet
    val fb = TextOps.winnow(b, 8, 4).toSet
    assert((fa & fb).nonEmpty)
  }

  test("density is near the expected 2/(w+1)") {
    // LCG text: k-grams are effectively unique, so the distinct-set size ~
    // the number of selected positions (the density the paper states)
    var x = 12345L
    val t = (0 until 4000).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      ('a' + math.floorMod(x >>> 33, 26).toInt).toChar
    }.mkString
    val nGrams = TextOps.charShingles(t, 8).length
    val nFps = TextOps.winnow(t, 8, 4).length
    val density = nFps.toDouble / nGrams
    assert(density > 0.25 && density < 0.55, s"density=$density") // 2/(4+1)=0.4
  }

  test("edge cases: empty, shorter than k, fewer hashes than w") {
    assert(TextOps.winnow("", 8, 4).isEmpty)
    assert(TextOps.winnow("1234567", 8, 4).isEmpty)
    // 10 chars -> 3 hashes < w=4: one truncated window, exactly 1 fingerprint
    val fps = TextOps.winnow("0123456789", 8, 4)
    assert(fps.length === 1)
    assert(refWinnow("0123456789", 8, 4) === fps.toSet)
  }

  test("expression evaluates through the Column API") {
    val got = Seq("the quick brown fox jumps over it").toDF("t")
      .select(vps.text.functions.winnow_fingerprints($"t", 8, 4).as("fps"))
      .as[Seq[Long]].head()
    assert(got === TextOps.winnow("the quick brown fox jumps over it", 8, 4).toSeq)
  }
}
