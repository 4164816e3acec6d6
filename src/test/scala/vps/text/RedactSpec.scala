package vps.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class RedactSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(s: String): (Long, Long, Long, String) =
    Seq(s).toDF("t").select(
      Redact.countEmails($"t").cast("long"),
      Redact.countPhones($"t").cast("long"),
      Redact.countIps($"t").cast("long"),
      Redact.redact($"t")).as[(Long, Long, Long, String)].head()

  test("emails, phones, and IPs are counted and replaced") {
    val (e, p, ip, red) = run(
      "mail a.b+c@sub.example.co.uk or b@x.io, call +44-207-9460 000 or 555 123 4567, host 192.168.0.1.")
    assert(e === 2 && p === 2 && ip === 1)
    assert(red === "mail <EMAIL> or <EMAIL>, call <PHONE> 000 or <PHONE>, host <IP>.")
  }

  test("replacement order: an email's host is not later rewritten as PII") {
    val (_, _, _, red) = run("x@a1.b2.org then 10.0.0.1")
    assert(red === "<EMAIL> then <IP>")
  }

  test("clean text passes through unchanged") {
    val s = "no personal data here, just 42 words and a version 1.2 string"
    val (e, p, ip, red) = run(s)
    assert(e === 0 && p === 0 && ip === 0)
    assert(red === s)
  }

  test("dotted quads do not trigger the phone pattern") {
    val (_, p, ip, _) = run("addr 10.255.0.1 and 8.8.8.8")
    assert(p === 0 && ip === 2)
  }
}
