package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.streaming.Streams

/** Structured Streaming surface, oracle-checked against batch SQL: a
  * bounded file stream drained through a memory sink must agree exactly
  * with the equivalent batch query (tumbling/sliding/session windows,
  * streaming dedup).
  */
object StreamPack extends QueryPack {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // tumbling 1h windows per event type (complete mode).
    "q40_stream_tumbling" -> { (s, d) =>
      Streams.drainToTable(
        Streams.tumblingCounts(Streams.eventsStream(s, d), "1 hour"),
        "tumbling", "complete")
    },

    // sliding 2h windows every 1h.
    "q41_stream_sliding" -> { (s, d) =>
      Streams.drainToTable(
        Streams.slidingCounts(Streams.eventsStream(s, d), "2 hours", "1 hour"),
        "sliding", "complete")
    },

    // session windows: 30-minute gap sessionization per user.
    "q42_stream_sessions" -> { (s, d) =>
      Streams.drainToTable(
        Streams.userSessions(Streams.eventsStream(s, d), "30 minutes"),
        "sessions", "complete")
    },

    // streaming dedup (state-backed dropDuplicates) → distinct users/type.
    "q43_stream_dedup" -> { (s, d) =>
      val deduped = Streams.drainToTable(
        Streams.dedupStream(Streams.eventsStream(s, d), Seq("user_id", "event_type")),
        "dedup", "append")
      deduped.groupBy("event_type").agg(count(lit(1)).as("n_users"))
    },

    // custom keyed state (mapGroupsWithState): running per-user activity.
    "q57_stateful_user_counts" -> { (s, d) =>
      Streams.drainToTable(
        Streams.statefulUserActivity(Streams.eventsStream(s, d)),
        "stateful", "update")
    }
  )

  override def oracles: Map[String, String] = Map(
    "q40_stream_tumbling" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS win_start, event_type,
          COUNT(*) AS n, ${Sql.dsum("value")} AS sum_value
          FROM events GROUP BY 1, 2""",

    "q41_stream_sliding" ->
      """SELECT win_start, COUNT(*) AS n FROM (
           SELECT CAST(unnest([date_trunc('hour', ts),
                               date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS TIMESTAMP) AS win_start
           FROM events)
         GROUP BY win_start""",

    "q42_stream_sessions" ->
      """WITH ordered AS (
           SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         tagged AS (
           SELECT user_id, ts_us,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM ordered)
         SELECT user_id, MIN(ts_us) AS session_start_us, COUNT(*) AS n
         FROM tagged GROUP BY user_id, sid""",

    "q43_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
         FROM events GROUP BY event_type""",

    "q57_stateful_user_counts" ->
      """SELECT user_id, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
         FROM events GROUP BY user_id"""
  )
}
