package vps.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact dedup ON INGEST — the streaming front of the batch
  * [[vps.ml.Dedup]] family: drop re-crawled / re-submitted documents before
  * they ever land in the corpus.
  *
  * Streaming semantics: `dropDuplicatesWithinWatermark` on the content
  * digest. Duplicates arriving within the watermark horizon of each other
  * are dropped; digest state is EVICTED as the watermark advances, so state
  * is bounded by the horizon's ingest volume — the non-negotiable for an
  * unbounded stream (a plain `dropDuplicates` would grow state forever).
  * The boundary this buys: a duplicate arriving LATER than the horizon
  * passes through (spec'd) — total dedup remains the batch
  * `Dedup.exactDuplicates` pass downstream. Within one micro-batch the
  * surviving row among same-batch duplicates is arbitrary (parallel
  * arrival order), exactly like any at-least-once ingest.
  *
  * Batch mirror (same call on a non-streaming frame): deterministic
  * first-arrival — min event time, ties to min id — which is how the spec
  * oracles the streaming path.
  */
object StreamingDedup {

  /** `tsCol` must be a TimestampType event-time column. Emits the input
    * schema plus the `digest` column.
    */
  def dedupOnIngest(
      docs: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      tsCol: String = "ts",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val withDigest = docs.withColumn("digest", sha2(col(textCol), 256))
    if (docs.isStreaming)
      withDigest
        .withWatermark(tsCol, watermarkDelay)
        .dropDuplicatesWithinWatermark("digest")
    else
      withDigest
        .withColumn("_rn",
          row_number().over(Window.partitionBy(col("digest")).orderBy(col(tsCol), col(idCol))))
        .where(col("_rn") === 1)
        .drop("_rn")
  }
}
