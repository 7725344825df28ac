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

  /** Pre-stage the late-arrival micro-batch files (q61/q66) so their write
    * cost stays out of the benched streaming path. */
  override def stage(s: SparkSession, d: String): Unit = {
    Streams.prepareLateArrivalFiles(s, d); ()
  }

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

    // session windows: 30-minute gap sessionization per user. Per-session
    // rows grow with the data → parquet sink, not the driver memory sink.
    "q42_stream_sessions" -> { (s, d) =>
      Streams.drainToParquet(
        Streams.userSessions(Streams.eventsStream(s, d), "30 minutes"),
        "sessions", "complete")
    },

    // streaming dedup (state-backed dropDuplicates) → distinct users/type.
    // The deduped row stream grows with the data → parquet sink; only the
    // small per-type rollup is collected.
    "q43_stream_dedup" -> { (s, d) =>
      val deduped = Streams.drainToParquet(
        Streams.dedupStream(Streams.eventsStream(s, d), Seq("user_id", "event_type")),
        "dedup", "append")
      deduped.groupBy("event_type").agg(count(lit(1)).as("n_users"))
    },

    // custom keyed state (mapGroupsWithState): running per-user activity.
    "q57_stateful_user_counts" -> { (s, d) =>
      Streams.drainToTable(
        Streams.statefulUserActivity(Streams.eventsStream(s, d)),
        "stateful", "update")
    },

    // withWatermark + append mode: three ordered micro-batches where the
    // third is entirely late data — the watermark (1h, advanced ≥7d past
    // every batch-1 window by batch 2) must drop all of it, and only
    // windows sealed by the final watermark are emitted.
    "q61_watermark_late" -> { (s, d) =>
      val dir = Streams.prepareLateArrivalFiles(s, d)
      val agg = Streams.lateArrivalStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      // sealed windows accumulate over time → parquet sink, not driver memory
      Streams.drainToParquet(agg, "wmark", "append")
    },

    // foreachBatch → parquet sink (the scale-path sink; memory sink is the
    // bounded-harness convenience): tumbling 2h counts, read back from the
    // sink files.
    "q65_stream_sink" -> { (s, d) =>
      Streams.drainToParquet(
        Streams.tumblingCounts(Streams.eventsStream(s, d), "2 hours"),
        "sink2h", "complete")
    },

    // flatMapGroupsWithState (0..N outputs per group per batch): per user,
    // one row per event type never seen before. Output grows with the key
    // space → parquet sink.
    "q74_stateful_new_types" -> { (s, d) =>
      Streams.drainToParquet(
        Streams.userNewTypes(Streams.eventsStream(s, d)),
        "newtypes", "append")
    },

    // stream-static enrichment join: the unbounded side joins a broadcast
    // static dimension (no state, no watermark needed — the standard
    // lookup-enrich shape), then daily tumbling counts per category.
    "q70_stream_enrich" -> { (s, d) =>
      val dim = s.createDataFrame(Seq(
        ("click", "interaction"), ("view", "interaction"),
        ("purchase", "conversion"), ("signup", "conversion"),
        ("error", "fault"))).toDF("event_type", "category")
      val enriched = Streams.eventsStream(s, d)
        .join(broadcast(dim), "event_type")
        .groupBy(window(col("ts"), "1 day"), col("category"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("day_start"), col("category"), col("n"))
      Streams.drainToTable(enriched, "enrich", "complete")
    },

    // stream-stream inner join (time-range condition, watermarked both
    // sides): clicks matched to the views they follow within 1h, per user.
    // Matched pairs grow with the data → parquet sink; the compact
    // per-user pair count is what's checked.
    "q78_stream_stream_join" -> { (s, d) =>
      val ev = Streams.eventsStream(s, d)
      val pairs = Streams.viewClickJoin(
        ev.filter(col("event_type") === "view"),
        ev.filter(col("event_type") === "click"), "1 HOUR")
      Streams.drainToParquet(pairs, "sjoin", "append")
        .groupBy(col("v_user").as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
    },

    // dedup-within-watermark: event-time among the dedup keys, so state is
    // evicted as the watermark passes and the all-late batch 3 is dropped
    // rather than re-emitted.
    "q66_watermark_dedup" -> { (s, d) =>
      val dir = Streams.prepareLateArrivalFiles(s, d)
      val dd = Streams.lateArrivalStream(s, dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates(Seq("user_id", "event_type", "ts"))
      // deduped row stream grows with the data → parquet sink; only the
      // per-type rollup is collected
      Streams.drainToParquet(dd, "wmdedup", "append")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
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
         FROM events GROUP BY user_id""",

    // Batch replay of the watermark run. Observed Spark 4 semantics (and
    // what this oracle asserts): the late-row filter of batch N runs with
    // the watermark derived from batches 1..N-2 — one batch of extra lag —
    // so batch 3's late rows survive iff their window outlives
    // max(batch-1 ts) − 1h; final emission (the trailing no-data batch)
    // seals windows up to the full watermark max(batch-2 ts) − 1h.
    "q61_watermark_late" ->
      s"""WITH e AS (SELECT event_id, event_type, value, CAST(ts AS TIMESTAMP) AS t FROM events),
          b AS (SELECT date_trunc('day', MIN(t)) + INTERVAL 7 DAY AS t1,
                       date_trunc('day', MIN(t)) + INTERVAL 14 DAY AS t2 FROM e),
          wml AS (SELECT MAX(t) - INTERVAL 1 HOUR AS w FROM e, b
                  WHERE t < b.t1 AND event_id % 10 <> 0),
          wm AS (SELECT MAX(t) - INTERVAL 1 HOUR AS w FROM e, b WHERE t >= b.t1 AND t < b.t2),
          counted AS (SELECT e.* FROM e, b
                      WHERE (t < b.t1 AND event_id % 10 <> 0) OR (t >= b.t1 AND t < b.t2)
                      UNION ALL
                      SELECT e.* FROM e, b, wml
                      WHERE t < b.t1 AND event_id % 10 = 0
                        AND date_trunc('hour', t) + INTERVAL 1 HOUR > wml.w)
          SELECT CAST(date_trunc('hour', t) AS TIMESTAMP) AS win_start, event_type,
                 COUNT(*) AS n, ${Sql.dsum("value")} AS sum_value
          FROM counted, wm
          GROUP BY 1, 2, wm.w
          HAVING win_start + INTERVAL 1 HOUR <= wm.w""",

    "q65_stream_sink" ->
      s"""SELECT make_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 7200000000) * 7200000000) AS win_start,
          event_type, COUNT(*) AS n, ${Sql.dsum("value")} AS sum_value
          FROM events GROUP BY 1, 2""",

    "q74_stateful_new_types" ->
      """SELECT DISTINCT user_id, event_type FROM events""",

    "q70_stream_enrich" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           CASE event_type
             WHEN 'click' THEN 'interaction' WHEN 'view' THEN 'interaction'
             WHEN 'purchase' THEN 'conversion' WHEN 'signup' THEN 'conversion'
             WHEN 'error' THEN 'fault' END AS category,
           COUNT(*) AS n
         FROM events GROUP BY 1, 2""",

    "q78_stream_stream_join" ->
      """WITH v AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'view'),
          c AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t FROM events WHERE event_type = 'click')
          SELECT v.user_id, COUNT(*) AS n_pairs
          FROM v JOIN c ON v.user_id = c.user_id
            AND c.t >= v.t AND c.t <= v.t + INTERVAL 1 HOUR
          GROUP BY v.user_id""",

    // Same lagged-late-filter model as q61, on row timestamps: batch-3
    // rows survive iff t > max(batch-1 ts) − 1h; dedup emits on arrival
    // (append), so no final-watermark seal applies.
    "q66_watermark_dedup" ->
      """WITH e AS (SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
          b AS (SELECT date_trunc('day', MIN(t)) + INTERVAL 7 DAY AS t1,
                       date_trunc('day', MIN(t)) + INTERVAL 14 DAY AS t2 FROM e),
          wml AS (SELECT MAX(t) - INTERVAL 1 HOUR AS w FROM e, b
                  WHERE t < b.t1 AND event_id % 10 <> 0),
          kept AS (SELECT e.* FROM e, b
                   WHERE (t < b.t1 AND event_id % 10 <> 0) OR (t >= b.t1 AND t < b.t2)
                   UNION ALL
                   SELECT e.* FROM e, b, wml
                   WHERE t < b.t1 AND event_id % 10 = 0 AND t > wml.w),
          dd AS (SELECT DISTINCT user_id, event_type, t FROM kept)
          SELECT event_type, COUNT(*) AS n FROM dd GROUP BY event_type"""
  )
}
