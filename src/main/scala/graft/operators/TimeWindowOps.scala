package graft.operators

import graft.{OpModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing in batch mode (SURVEY.md §2B q36–q38): tumbling,
  * sliding and session windows over the `events` table. The same
  * `window()` / `session_window()` expressions run unchanged under
  * Structured Streaming (see [[graft.streaming.StreamOps]]) — watermarks
  * then bound the state store instead of a full shuffle.
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregations on
  * (window, key) — two-phase, shuffle on the composite key. Session
  * windows shuffle on user_id then merge sorted runs per key; state per
  * key is O(sessions), bounded by the 30-min gap.
  */
object TimeWindowOps extends OpModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_win_tumbling" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("hour_start"), col("event_type"),
                col("cnt"))
        .orderBy("hour_start", "event_type")
    },

    "q37_win_sliding" -> { (s, d) =>
      Tables(s, d, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start").as("win_start"), col("cnt"))
        .orderBy("win_start")
    },

    "q38_win_session" -> { (s, d) =>
      sessionize(Tables(s, d, "events")).orderBy("user_id", "sess_start")
    }
  )

  /** Gap-based sessionization shared by q38 (batch, 30-min default) and
    * q80_stream_sessionize (streaming): ONE definition is what makes
    * their bit-parity structural rather than copy-discipline. Works on
    * any frame with (user_id, ts) — batch DataFrame or stream — and any
    * gap width (`dur_us` = last-event − first-event, i.e. window span
    * minus the trailing gap session_window appends). Non-default gaps
    * are spec-tested against an independent gaps-and-islands fold. */
  private[graft] def sessionize(events: DataFrame,
                                gapMinutes: Int = 30): DataFrame =
    events
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("user_id"),
              col("session_window.start").as("sess_start"),
              col("cnt"),
              (unix_micros(col("session_window.end")) -
               unix_micros(col("session_window.start")) -
               lit(gapMinutes * 60000000L)).as("dur_us"))

  def oracles: Map[String, String] = Map(
    "q36_win_tumbling" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS cnt
        |FROM events GROUP BY hour_start, event_type
        |ORDER BY hour_start, event_type""".stripMargin,

    // Each event falls in exactly two 1h/30min sliding windows: the one
    // starting at its 30-min floor and the one 30 minutes earlier.
    "q37_win_sliding" ->
      """SELECT win_start, count(*) AS cnt FROM (
        |  SELECT unnest([
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000),
        |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000)
        |  ]) AS win_start
        |  FROM events)
        |GROUP BY win_start ORDER BY win_start""".stripMargin,

    // Gap-islands sessionization; Spark merges an event into the session
    // when its gap to the previous event is <= 30 min INCLUSIVE (verified
    // in CorrectnessSpec), so only a strictly greater gap opens a session.
    "q38_win_session" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), se AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g)
        |SELECT user_id, min(ts) AS sess_start, count(*) AS cnt,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us
        |FROM se GROUP BY user_id, sid
        |ORDER BY user_id, sess_start""".stripMargin
  )
}
