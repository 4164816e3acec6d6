package vps.sql

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.locationtech.jts.geom.Geometry
import vps.geom.{Geo, Wkb}

/** Typed aggregators (SURVEY.md §2.4 A6/A9/A11) via the modern `Aggregator` API —
  * the reference uses the removed `UserDefinedAggregateFunction`
  * (`/root/reference/src/test/scala/vectorpipe/vectortile/WeightedCentroid.scala:11-58`).
  */
object Aggregators {

  /** (weight * x, weight * y, weight) running sums -> weighted centroid Point. */
  object WeightedCentroid extends Aggregator[(Array[Byte], Double), (Double, Double, Double), Array[Byte]] {
    override def zero: (Double, Double, Double) = (0.0, 0.0, 0.0)
    override def reduce(b: (Double, Double, Double), in: (Array[Byte], Double)): (Double, Double, Double) = {
      val c = Wkb.read(in._1).getCoordinate
      (b._1 + c.x * in._2, b._2 + c.y * in._2, b._3 + in._2)
    }
    override def merge(a: (Double, Double, Double), b: (Double, Double, Double)): (Double, Double, Double) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    override def finish(b: (Double, Double, Double)): Array[Byte] =
      if (b._3 == 0.0) null else Wkb.write(Geo.point(b._1 / b._3, b._2 / b._3))
    override def bufferEncoder: Encoder[(Double, Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Merge tag maps, `;`-joining the distinct values per key (reference A11). */
  object ReduceTags extends Aggregator[Map[String, String], Map[String, Seq[String]], Map[String, String]] {
    override def zero: Map[String, Seq[String]] = Map.empty
    override def reduce(b: Map[String, Seq[String]], tags: Map[String, String]): Map[String, Seq[String]] =
      if (tags == null) b
      else tags.foldLeft(b) { case (acc, (k, v)) =>
        acc.updated(k, acc.get(k) match {
          case Some(vs) if vs.contains(v) => vs
          case Some(vs)                   => vs :+ v
          case None                       => Seq(v)
        })
      }
    override def merge(a: Map[String, Seq[String]], b: Map[String, Seq[String]]): Map[String, Seq[String]] =
      b.foldLeft(a) { case (acc, (k, vs)) =>
        acc.updated(k, (acc.getOrElse(k, Seq.empty) ++ vs).distinct)
      }
    override def finish(b: Map[String, Seq[String]]): Map[String, String] =
      b.map { case (k, vs) => k -> vs.mkString(";") }
    override def bufferEncoder: Encoder[Map[String, Seq[String]]] =
      org.apache.spark.sql.Encoders.kryo[Map[String, Seq[String]]].asInstanceOf[Encoder[Map[String, Seq[String]]]]
    override def outputEncoder: Encoder[Map[String, String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Merge count maps by summing per-key (reference A9 merge_counts/sum_counts). */
  object MergeCounts extends Aggregator[Map[String, Int], Map[String, Int], Map[String, Int]] {
    override def zero: Map[String, Int] = Map.empty
    override def reduce(b: Map[String, Int], m: Map[String, Int]): Map[String, Int] = merge(b, m)
    override def merge(a: Map[String, Int], b: Map[String, Int]): Map[String, Int] =
      if (b == null) a
      else b.foldLeft(a) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0) + v) }
    override def finish(b: Map[String, Int]): Map[String, Int] = b
    override def bufferEncoder: Encoder[Map[String, Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column-facing weighted centroid: weighted_centroid(geom, weight). */
  def weightedCentroid(geom: Column, weight: Column): Column = {
    import vps.sql.functions.{st_asWKB, st_geomFromWKB}
    st_geomFromWKB(udaf(WeightedCentroid).apply(st_asWKB(geom), weight))
  }

  def reduceTags(tags: Column): Column = udaf(ReduceTags).apply(tags)
  def mergeCounts(counts: Column): Column = udaf(MergeCounts).apply(counts)
}
