package vps.text

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import vps.SparkTestSession

class RandomProjectionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      var x = 9000L + i
      i.toLong -> Array.tabulate(dim) { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ((x >>> 40) / 16777216.0f) - 0.5f
      }
    }

  test("expression equals the direct plane-dot computation") {
    val data = vecs(8, 64)
    val got = data.toDF("id", "v")
      .select($"id", functions.random_projection($"v", 8).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val planes = Hyperplanes.planes(8, 1, 64)
    data.foreach { case (id, v) =>
      val want = planes.map { plane =>
        var dot = 0.0
        var d = 0
        while (d < v.length) { dot += v(d) * plane(d); d += 1 }
        dot
      }.toSeq
      assert(got(id) === want, s"id=$id")
    }
  }

  test("JL sanity: relative pairwise distances correlate between spaces") {
    val data = vecs(30, 64)
    val proj = data.map { case (id, v) =>
      val planes = Hyperplanes.planes(16, 1, 64)
      id -> planes.map(pl => (0 until 64).map(d => v(d) * pl(d)).sum)
    }.toMap
    def d2(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val origs = data.toMap
    val pairs = for (i <- 0 until 10; j <- (i + 1) until 10) yield (i.toLong, j.toLong)
    val dOrig = pairs.map { case (a, b) =>
      d2(origs(a).map(_.toDouble).toSeq, origs(b).map(_.toDouble).toSeq) }
    val dProj = pairs.map { case (a, b) => d2(proj(a).toSeq, proj(b).toSeq) }
    // Spearman-ish: the most-distant original pair stays in the top half
    val topOrig = dOrig.zipWithIndex.maxBy(_._1)._2
    val rankProj = dProj.zipWithIndex.sortBy(-_._1).indexWhere(_._2 == topOrig)
    assert(rankProj < pairs.length / 2,
      s"farthest original pair fell to projected rank $rankProj of ${pairs.length}")
  }

  test("deterministic across invocations and partitionings") {
    val df = vecs(16, 64).toDF("id", "v").repartition(5)
    val a = df.select($"id", functions.random_projection($"v", 4)).collect().toSeq
    val b = df.repartition(2).select($"id", functions.random_projection($"v", 4)).collect().toSeq
    assert(a.toSet === b.toSet)
  }
}
