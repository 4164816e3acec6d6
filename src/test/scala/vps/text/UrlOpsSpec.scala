package vps.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("extractUrls finds every URL in order and nothing else") {
    val text = "pre https://www.example.co.uk/d/1?x=2 mid http://img.foo.net/p " +
      "bare ftp://no.match and https://h0st-1.org end"
    val got = Seq(text).toDF("t")
      .select(UrlOps.extractUrls($"t").as("u")).as[Seq[String]].head()
    assert(got === Seq(
      "https://www.example.co.uk/d/1?x=2",
      "http://img.foo.net/p",
      "https://h0st-1.org"))
  }

  test("registeredDomain truth table incl. 2-letter ccTLD second-level rules") {
    val cases = Seq(
      "www.example.co.uk" -> "example.co.uk",
      "img.foo.net"       -> "foo.net",
      "a.b.c.d.com"       -> "d.com",
      "foo.co.uk"         -> "foo.co.uk",
      "co.uk"             -> "co.uk",     // only 2 labels: no third to take
      "gov.br.example.de" -> "example.de", // 'example' not in the suffix set
      "x.ac.jp"           -> "x.ac.jp",
      "localhost"         -> "localhost")
    val got = cases.map(_._1).toDF("h")
      .select($"h", UrlOps.registeredDomain($"h").as("d"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (h, want) => assert(got(h) === want, h) }
  }

  test("urlHost strips scheme, port, and path") {
    val got = Seq("https://www.Ex.com:8080/a/b?q=1", "http://plain.org")
      .toDF("u").select(UrlOps.urlHost($"u")).as[String].collect()
    assert(got === Seq("www.Ex.com", "plain.org"))
  }

  test("normalizeUrl truth table: fragment, case, default ports, trackers, tidy") {
    val cases = Seq(
      "HTTP://WWW.Ex.COM:80/Path/?utm_source=x&id=3&fbclid=a#frag"
        -> "http://www.ex.com/Path/?id=3",
      "https://CDN.a.Net:443/x/?gclid=1" -> "https://cdn.a.net/x",
      "http://a.com:8080/keep" -> "http://a.com:8080/keep", // non-default port kept
      "https://a.com/?utm_a=1&utm_b=2&utm_c=3" -> "https://a.com",
      "https://a.com/p?real=1&utm_x=2&also=3" -> "https://a.com/p?real=1&also=3",
      "https://a.com/" -> "https://a.com",
      "not a url at all" -> "not a url at all",
      "https://a.com/CaseKept/Path" -> "https://a.com/CaseKept/Path")
    val got = cases.map(_._1).toDF("u")
      .select($"u", UrlOps.normalizeUrl($"u").as("n"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (u, want) => assert(got(u) === want, u) }
  }

  // Skewed corpus: one hot domain (200 rows), several small ones, plus a
  // domain exactly at the cap boundary.
  private def skewed = {
    val rows =
      (0 until 200).map(i => ("hot.com", 1000L + i)) ++
      (0 until 7).map(i => ("warm.net", 2000L + i)) ++
      (0 until 5).map(i => ("edge.org", 3000L + i)) ++ // == cap when cap=5
      Seq(("cold.io", 4000L))
    rows.toDF("domain", "rid")
  }

  test("domainCap (heap aggregate) keeps exactly the window form's rows") {
    for (cap <- Seq(1, 5, 64); salt <- Seq(0L, 11L)) {
      val viaHeap = UrlOps.domainCap(skewed, "domain", "rid", cap, salt)
        .select($"domain", $"rid").as[(String, Long)].collect().toSet
      val viaWindow = UrlOps.domainCapWindow(skewed, "domain", "rid", cap, salt)
        .as[(String, Long)].collect().toSet
      assert(viaHeap === viaWindow, s"cap=$cap salt=$salt")
      assert(viaHeap.count(_._1 == "hot.com") === math.min(cap, 200))
      assert(viaHeap.count(_._1 == "cold.io") === 1)
    }
  }

  test("non-broadcast join-back keeps the identical set") {
    val bc = UrlOps.domainCap(skewed, "domain", "rid", 5, 11L)
      .select($"domain", $"rid").as[(String, Long)].collect().toSet
    val sh = UrlOps.domainCap(skewed, "domain", "rid", 5, 11L, broadcastJoinBack = false)
      .select($"domain", $"rid").as[(String, Long)].collect().toSet
    assert(bc === sh)
  }

  test("kept set is a pure function of (id, salt): partitioning-independent and salt-sensitive") {
    val base = UrlOps.domainCap(skewed.repartition(1), "domain", "rid", 5, 11L)
      .select($"domain", $"rid").as[(String, Long)].collect().toSet
    val shuffled = UrlOps.domainCap(skewed.repartition(13, $"rid"), "domain", "rid", 5, 11L)
      .select($"domain", $"rid").as[(String, Long)].collect().toSet
    assert(base === shuffled)
    val otherSalt = UrlOps.domainCap(skewed, "domain", "rid", 5, 12L)
      .select($"domain", $"rid").as[(String, Long)].collect().toSet
    assert(base.count(_._1 == "hot.com") === 5)
    assert(base !== otherSalt) // 5-of-200 under a new salt: collision ~ C(200,5)^-1
  }

  test("cap is subset-stable under corpus growth (a kept id stays kept only if still in the smallest)") {
    // determinism across reruns on the SAME data is the contract; growth can
    // evict (by design, unlike reservoir "sticky" caps). Assert rerun equality.
    val a = UrlOps.domainCap(skewed, "domain", "rid", 8, 3L).select($"domain", $"rid").as[(String, Long)].collect().toSet
    val b = UrlOps.domainCap(skewed, "domain", "rid", 8, 3L).select($"domain", $"rid").as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("heap aggregate runs as a two-phase (partial + final) aggregation") {
    val kept = skewed.groupBy($"domain")
      .agg(vps.text.functions.keep_smallest(
        vps.text.functions.hash_uniform($"rid", 11L), $"rid", 5).as("k"))
    val plan = kept.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final ObjectHashAggregate:\n$plan")
  }

  test("keep_smallest orders NEGATIVE keys correctly (public any-double contract)") {
    // raw doubleToRawLongBits order is reversed for negatives; the sign-mirror
    // transform must make keep_smallest agree with plain double ordering
    val rows = Seq((-3.5, 1L), (-0.25, 2L), (0.0, 3L), (1.5, 4L), (-7.0, 5L), (0.75, 6L))
    val df = rows.toDF("k", "id")
    val kept = df.groupBy().agg(
        vps.text.functions.keep_smallest($"k", $"id", 3).as("ids"))
      .select(org.apache.spark.sql.functions.explode($"ids").as("id"))
      .as[Long].collect().toSet
    val want = rows.sortBy(_._1).take(3).map(_._2).toSet // -7.0, -3.5, -0.25
    assert(kept === want)
  }

  test("domainCapAudit reports kept/dropped arithmetic") {
    val audit = UrlOps.domainCapAudit(skewed, "domain", "rid", 5)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(audit("hot.com") === ((200L, 5L, 195L)))
    assert(audit("edge.org") === ((5L, 5L, 0L)))
    assert(audit("cold.io") === ((1L, 1L, 0L)))
  }
}
