package vps.geom

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** Error-channel surface for malformed-geometry tolerance (the reference's
  * pluggable `ErrorHandler` + `RobustFeature[G,D]` Option-geometry wrapper,
  * `AugmentedDiffReader.scala:17-64`, `util/RobustFeature.scala:12-20`).
  *
  * A channel wraps a Spark [[LongAccumulator]]: expressions increment it on
  * the executors (accumulators ship with the task closure and merge on the
  * driver), so a 1000-executor run surfaces one global malformed count without
  * any extra shuffle or job. Rows are NEVER silently dropped — a malformed
  * value becomes a null geometry the caller can filter, count, or route to a
  * dead-letter sink, and the channel says how many there were.
  */
final case class ErrorChannel(name: String, acc: LongAccumulator) extends Serializable {
  def increment(): Unit = acc.add(1L)
  /** Driver-side: errors observed so far (accurate after an action completes). */
  def count: Long = acc.value
  def reset(): Unit = acc.reset()
}

object GeomErrors {
  /** New named channel registered with the session's SparkContext (shows up in
    * the UI/event log as `vps.geom.errors.<name>`).
    */
  def channel(spark: SparkSession, name: String): ErrorChannel =
    ErrorChannel(name, spark.sparkContext.longAccumulator(s"vps.geom.errors.$name"))
}
