package vps.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val MaxTok = 100L
  private val Bucket = 8L

  // ids 0..63, token counts cycling 10,35,60,85,0,110,25,50
  private def corpus = spark.range(64).toDF("id")
    .withColumn("tok", element_at(
      array(lit(10L), lit(35L), lit(60L), lit(85L), lit(0L), lit(110L), lit(25L), lit(50L)),
      ($"id" % 8 + 1).cast("int")))

  private def packed = Packing.packGreedy(corpus, "id", "tok", MaxTok, Bucket)
    .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("greedy walk matches an independent sequential replay") {
    val toks = corpus.as[(Long, Long)].collect().sortBy(_._1).toMap
    val got = packed
    // replay per bucket
    var seq = 0L; var cum = 0L; var bucket = -1L
    got.foreach { case (id, b, s, off) =>
      assert(b === id / Bucket)
      if (b != bucket) { bucket = b; seq = 0L; cum = 0L }
      val tok = toks(id)
      if (cum > 0 && cum + tok > MaxTok) { seq += 1; cum = 0L }
      assert(s === seq, s"seq of id=$id")
      assert(off === cum, s"offset of id=$id")
      cum += tok
    }
  }

  test("every sequence fits the budget unless it is a single oversized doc") {
    val toks = corpus.as[(Long, Long)].collect().toMap
    packed.groupBy(r => (r._2, r._3)).foreach { case ((b, s), rows) =>
      val total = rows.map(r => toks(r._1)).sum
      assert(total <= MaxTok || rows.length == 1, s"bucket=$b seq=$s total=$total n=${rows.length}")
    }
  }

  test("deterministic under repartition and input order") {
    val shuffled = Packing.packGreedy(
      corpus.orderBy(rand(42)).repartition(7), "id", "tok", MaxTok, Bucket)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(shuffled.toSeq === packed.toSeq)
  }

  test("offsets are the running token sum within each sequence") {
    val toks = corpus.as[(Long, Long)].collect().toMap
    packed.groupBy(r => (r._2, r._3)).foreach { case (_, rows) =>
      val inOrder = rows.sortBy(_._1)
      inOrder.zip(inOrder.map(r => toks(r._1)).scanLeft(0L)(_ + _)).foreach {
        case ((_, _, _, off), want) => assert(off === want)
      }
    }
  }
}
