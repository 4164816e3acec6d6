package vps.ml

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Greedy sequence packing: concatenate documents into fixed-token-budget
  * training sequences (the step that turns a filtered corpus into model
  * inputs).
  *
  * Global greedy packing is inherently order-sequential — a 100-TB corpus
  * cannot thread one cursor through every document. The scalable form packs
  * within id-range BUCKETS: bucket = id / bucketSize is the unit of
  * parallelism, documents pack greedily in id order inside each bucket, and
  * the result is a pure function of (id, tokens, maxTokens, bucketSize) —
  * independent of partitioning, cluster size, and input order. Waste vs a
  * global pack is at most one underfull tail sequence per bucket, driven to
  * zero by larger buckets; each task buffers at most `bucketSize` (id, token)
  * pairs (16 B each), NOT the documents themselves.
  *
  * One shuffle (groupByKey on bucket), then map-side emit. Documents longer
  * than `maxTokens` get a sequence of their own (the greedy reset does this
  * naturally) — flag or split oversized docs upstream if truncation is
  * wanted.
  */
object Packing {

  /** Packs `(idCol, tokensCol)` rows; returns one row per document:
    * `(id, bucket, seq_idx, t_offset)` where `seq_idx` counts sequences
    * within the bucket and `t_offset` is the document's first-token position
    * inside its sequence.
    */
  def packGreedy(
      df: DataFrame,
      idCol: String,
      tokensCol: String,
      maxTokens: Long,
      bucketSize: Long = 4096L): DataFrame = {
    require(maxTokens > 0 && bucketSize > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, Long)] =
      df.select(col(idCol).cast("long"), col(tokensCol).cast("long")).as[(Long, Long)]
    pairs
      .groupByKey { case (id, _) => id / bucketSize }
      .flatMapGroups { (bucket, it) =>
        // group order is not guaranteed: buffer + sort the (id, tokens)
        // pairs (bounded at bucketSize entries)
        val docs = it.toArray.sortBy(_._1)
        var seq = 0L
        var cum = 0L
        docs.iterator.map { case (id, tok) =>
          if (cum > 0 && cum + tok > maxTokens) { seq += 1; cum = 0L }
          val off = cum
          cum += tok
          (id, bucket, seq, off)
        }
      }
      .toDF("id", "bucket", "seq_idx", "t_offset")
  }
}
