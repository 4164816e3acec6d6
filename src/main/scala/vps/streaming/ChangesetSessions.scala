package vps.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Streaming analytics over the changeset feed — the engine's Structured
  * Streaming depth beyond source plumbing: watermarked gap-based session
  * windows (builtin `session_window`, append mode — sessions emit when the
  * watermark passes their close) and a custom stateful operator
  * (`mapGroupsWithState`, update mode — running per-user totals carried
  * across micro-batches in managed state). Both run identically over the
  * batch mirror ([[Changesets.frame]]), which is how the specs oracle them.
  */
object ChangesetSessions {

  /** Comment events (user, ts) exploded from the nested comments array. */
  def commentEvents(changesets: DataFrame): DataFrame =
    changesets.select(explode(col("comments")).as("c"))
      .select(col("c.user").as("user"), timestamp_seconds(col("c.ts")).as("ts"))

  /** Per-user comment sessions: consecutive comments by one user with gaps
    * below `gapSeconds` merge into one session row
    * (user, session_start, session_end, n_comments).
    */
  def commentSessions(
      changesets: DataFrame,
      gapSeconds: Int = 600,
      watermarkDelay: String = "10 minutes"): DataFrame =
    commentEvents(changesets)
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user"), session_window(col("ts"), s"$gapSeconds seconds").as("w"))
      .agg(count(lit(1)).as("n_comments"))
      .select(col("user"),
        col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("n_comments"))

  final case class UserActivity(user: String, nChangesets: Long, nComments: Long, lastCreatedAt: Long)

  /** Running per-user activity — changeset count, comment count, newest
    * created_at — via `mapGroupsWithState`: state is O(1) per user and
    * survives across micro-batches (and restarts, through the query
    * checkpoint). Emit in update mode.
    *
    * State lifetime: with `stateTtlSeconds = None` state never expires —
    * acceptable for a bounded user population, but over an unbounded one the
    * store grows monotonically. Passing a TTL switches to an EVENT-TIME
    * timeout (deterministic — driven by the watermark, not the wall clock):
    * a user idle for longer than the TTL has their state evicted once the
    * watermark passes `lastCreatedAt + ttl`; the eviction emits the final
    * snapshot, and a later re-arrival starts counting from zero (the totals
    * before the idle gap are gone — that is the cost of bounding state).
    * In the batch mirror timeouts never fire, so batch results equal the
    * no-TTL semantics and stay oracle-checkable.
    */
  def userActivity(
      changesets: DataFrame,
      stateTtlSeconds: Option[Long] = None,
      watermarkDelay: String = "10 minutes"): Dataset[UserActivity] = {
    val spark = changesets.sparkSession
    import spark.implicits._

    def fold(user: String, rows: Iterator[(String, Long, Long)], prev: Option[UserActivity]): UserActivity = {
      var s = prev.getOrElse(UserActivity(user, 0L, 0L, Long.MinValue))
      rows.foreach { case (_, created, nc) =>
        s = UserActivity(user, s.nChangesets + 1, s.nComments + nc,
          math.max(s.lastCreatedAt, created))
      }
      s
    }

    stateTtlSeconds match {
      case None =>
        val typed = changesets
          .select(col("user"), col("created_at"), size(col("comments")).cast("long").as("nc"))
          .as[(String, Long, Long)]
        typed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout) {
          (user: String, rows: Iterator[(String, Long, Long)], state: GroupState[UserActivity]) =>
            val s = fold(user, rows, state.getOption)
            state.update(s)
            s
        }
      case Some(ttl) =>
        require(ttl > 0, "stateTtlSeconds must be positive")
        // the watermarked column must survive into the stateful operator
        // (projecting it away drops the watermark tag), so it rides the tuple
        val typed = changesets
          .withColumn("_ts", timestamp_seconds(col("created_at")))
          .withWatermark("_ts", watermarkDelay)
          .select(col("user"), col("created_at"), size(col("comments")).cast("long").as("nc"),
            col("_ts"))
          .as[(String, Long, Long, java.sql.Timestamp)]
        typed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.EventTimeTimeout) {
          (user: String, rowsT: Iterator[(String, Long, Long, java.sql.Timestamp)],
              state: GroupState[UserActivity]) =>
            val rows = rowsT.map(r => (r._1, r._2, r._3))
            if (state.hasTimedOut) {
              val last = state.get
              state.remove()
              last // final snapshot at eviction
            } else {
              val s = fold(user, rows, state.getOption)
              state.update(s)
              // timeout must stay ahead of the current watermark (late rows
              // could otherwise compute one behind it)
              state.setTimeoutTimestamp(
                math.max((s.lastCreatedAt + ttl) * 1000L, state.getCurrentWatermarkMs + 1))
              s
            }
        }
    }
  }
}
