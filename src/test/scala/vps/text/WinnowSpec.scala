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

  test("winnowCandidates surfaces substring-sharing pairs with exact shared counts") {
    val base = "completely distinct filler words occupy this document body here"
    val shared = "zqxjkvbw unique plagiarized passage travels between docs"
    val rows = Seq(
      (1L, s"$base alpha $shared omega"),
      (2L, s"different framing text $shared unrelated tail"),
      (3L, "third document shares nothing with anyone at all today"))
    val df = spark.createDataFrame(rows).toDF("id", "text")
    val got = vps.ml.Dedup.winnowCandidates(df, minShared = 1, maxBucket = 64)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // brute-force expectation: intersection of winnow sets, restricted to
    // fps appearing in <= maxBucket docs (all sub-cap here)
    val fps = rows.map { case (id, t) => id -> TextOps.winnow(t, 8, 4).toSet }.toMap
    val want12 = (fps(1L) & fps(2L)).size
    assert(want12 > 0)
    assert(got((1L, 2L)) === want12.toLong)
    assert(!got.contains((1L, 3L)) || got((1L, 3L)) === (fps(1L) & fps(3L)).size.toLong)
    assert(!got.contains((2L, 3L)) || got((2L, 3L)) === (fps(2L) & fps(3L)).size.toLong)
  }

  test("winnowCandidates drops over-cap fingerprint buckets (boilerplate) entirely") {
    // 70 docs all share one boilerplate sentence; pairwise-unique remainders
    val boiler = "this exact boilerplate sentence appears everywhere verbatim"
    val rows = (0 until 70).map { i =>
      (i.toLong, s"unique prefix number $i $boiler distinct suffix $i end")
    }
    val df = spark.createDataFrame(rows).toDF("id", "text")
    val withCap = vps.ml.Dedup.winnowCandidates(df, minShared = 1, maxBucket = 64)
      .as[(Long, Long, Long)].collect()
    val noCap = vps.ml.Dedup.winnowCandidates(df, minShared = 1, maxBucket = 4096)
      .as[(Long, Long, Long)].collect()
    // without the cap the shared boilerplate links all C(70,2) pairs; with it,
    // the 70-doc buckets vanish and only sub-cap overlaps remain
    assert(noCap.length >= 69 * 70 / 2)
    // residual pairs come from sub-cap numeric-suffix overlaps ("suffix 1"
    // vs "suffix 10"), not the boilerplate clique
    assert(withCap.length < noCap.length / 4,
      s"cap should prune boilerplate pairs: ${withCap.length} vs ${noCap.length}")
  }

  test("expression evaluates through the Column API") {
    val got = Seq("the quick brown fox jumps over it").toDF("t")
      .select(vps.text.functions.winnow_fingerprints($"t", 8, 4).as("fps"))
      .as[Seq[Long]].head()
    assert(got === TextOps.winnow("the quick brown fox jumps over it", 8, 4).toSeq)
  }
}
