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
    */
  def userActivity(changesets: DataFrame): Dataset[UserActivity] = {
    val spark = changesets.sparkSession
    import spark.implicits._
    val typed = changesets
      .select(col("user"), col("created_at"), size(col("comments")).cast("long").as("nc"))
      .as[(String, Long, Long)]
    typed.groupByKey(_._1).mapGroupsWithState(GroupStateTimeout.NoTimeout) {
      (user: String, rows: Iterator[(String, Long, Long)], state: GroupState[UserActivity]) =>
        var s = state.getOption.getOrElse(UserActivity(user, 0L, 0L, Long.MinValue))
        rows.foreach { case (_, created, nc) =>
          s = UserActivity(user, s.nChangesets + 1, s.nComments + nc,
            math.max(s.lastCreatedAt, created))
        }
        state.update(s)
        s
    }
  }
}
