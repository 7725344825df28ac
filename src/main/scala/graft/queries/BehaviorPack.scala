package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.relational.Intervals
import graft.util.{Parity, Staging}

/** Wave-6 behavioral / event analytics: funnel conversion, cohort
  * retention, grouped outlier detection, sketch-state distinct rollup,
  * and the banded interval-overlap join — the product-analytics surface
  * of an events warehouse, each in its scalable shape.
  */
object BehaviorPack extends QueryPack {

  /** Per-(day, event_type) HLL sketches of the user set, staged to parquet
    * — the persisted sketch STATE q130 rolls up. The point of sketch
    * columns at 100 TB: a distinct rollup across any slice becomes a
    * fixed-size merge of pre-computed state instead of a re-shuffle of the
    * raw key space (DataSketches HLL: order-independent, deterministic for
    * a fixed input set). */
  private def stagedSketches(s: SparkSession, d: String): String =
    Staging.ensure(Staging.dirFor("daily_hll", d), s"$d/events.parquet") { dir =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.mode("overwrite").parquet(dir)
    }

  override def stage(s: SparkSession, d: String): Unit = { stagedSketches(s, d); () }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── q127: funnel conversion (view → click → purchase, in order) ────
    // Stage timestamps via chained min-over-user windows: each stage's
    // first-completion time conditions on the previous stage's. All three
    // windows share one partitioning, so the user key shuffles ONCE and
    // the stages are sort-local passes — no per-stage join, no
    // self-join explosion.
    "q127_funnel" -> { (s, d) =>
      val w = Window.partitionBy("user_id")
      val perUser = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_type"))
        .withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
        .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
          col("ts"))).over(w))
        .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
          col("ts"))).over(w))
        .select("user_id", "tv", "tc", "tp").distinct()
      perUser.agg(count(lit(1)).as("n_users"), count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click"), count(col("tp")).as("n_purchase"))
    },

    // ── q128: weekly cohort retention ──────────────────────────────────
    // Cohort = week of first activity; activity de-duplicated to
    // (user, week). Both sides key on user_id, so the join after the two
    // aggregates is co-partitioned — the classic retention triangle in
    // two shuffles total.
    "q128_retention" -> { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      val first = ev.groupBy("user_id").agg(min(col("wk")).as("cohort"))
      ev.distinct().join(first, "user_id")
        .groupBy(col("cohort"), datediff(col("wk"), col("cohort")).cast("long").as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },

    // ── q129: grouped z-score outlier detection ────────────────────────
    // Exact-decimal per-group moments (one aggregate), broadcast back to
    // the stream (map-side join — the group count is tiny), z rounded at
    // source so the |z| > 3 cut is engine-portable.
    "q129_group_outliers" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val stats = ev.groupBy("event_type")
        .agg(Parity.davg(col("value")).as("mean"), Parity.dvar(col("value")).as("var"))
      ev.join(broadcast(stats), "event_type")
        .withColumn("z", round((col("value") - col("mean")) / sqrt(col("var")), 6))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          count(when(abs(col("z")) > 3, lit(1))).as("n_outliers"),
          round(max(abs(col("z"))), 6).as("max_abs_z"))
    },

    // ── q130: distinct-user rollup from persisted HLL sketch state ─────
    // Merges the staged per-(day, type) sketches across types per day —
    // a fixed-size state merge where the from-scratch recount would
    // re-shuffle every event. Estimate is deterministic; the oracle gate
    // is the q79 pattern (exact count carried alongside, ≤5% bound as a
    // checked boolean — lgK=12 ⇒ ~1.6% rsd, well inside).
    "q130_sketch_rollup" -> { (s, d) =>
      val daily = s.read.parquet(stagedSketches(s, d))
        .groupBy("day")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("n_approx"))
      val exact = Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(daily, "day")
        .select(col("day"), col("n_exact"),
          (abs(col("n_approx") - col("n_exact")).cast("double") / col("n_exact") <= lit(0.05))
            .as("within_5pct"))
    },

    // ── q131: banded interval-overlap join ─────────────────────────────
    // User sessions (30-min session_window islands) × platform incident
    // windows (±30 min around sampled error events): which sessions ran
    // through an incident. Hour-binned equi-join via [[Intervals]] — no
    // cartesian; the oracle replays the naive quadratic join, proving the
    // banded plan loses nothing.
    "q131_interval_overlap" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val sessions = ev
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("sw.start").as("sess_start"), col("sw.end").as("sess_end"))
      val incidents = ev
        .filter(col("event_type") === "error" && pmod(col("event_id"), lit(50)) === 0)
        .select(col("event_id").as("incident_id"),
          (col("ts") - expr("interval 30 minutes")).as("inc_start"),
          (col("ts") + expr("interval 30 minutes")).as("inc_end"))
      Intervals.overlapJoin(sessions, "sess_start", "sess_end",
          incidents, "inc_start", "inc_end")
        .select("user_id", "sess_start", "incident_id")
    },

    // ── q136: event-transition matrix (first-order Markov) ─────────────
    // lead() over (user, time) — ties broken by event_id so the sequence
    // is total-ordered — then one count aggregate; transition probability
    // is a raw integer/integer double division (correctly-rounded IEEE op,
    // bit-identical cross-engine — no rounding needed, the q120 pattern).
    "q136_transitions" -> { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
      val counts = pairs.groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("event_type").agg(sum(col("n")).as("rt"))
      counts.join(broadcast(totals), "event_type")
        .select(col("event_type"), col("next_type"), col("n"),
          (col("n").cast("double") / col("rt").cast("double")).as("p"))
    },

    // ── q137: dynamic pivot (columns discovered from the data) ─────────
    // `pivot` without an explicit value list: Spark collects the distinct
    // keys in a first micro-job (sorted, capped by spark.sql.pivotMaxValues)
    // and compiles them into ONE pivoting aggregate — the two-phase shape
    // any dynamic reshape needs at scale; the wide result never shuffles
    // twice. Missing combinations are 0-filled to match COUNT semantics.
    "q137_dynamic_pivot" -> { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).as("day"))
        .pivot(col("event_type"))
        .agg(count(lit(1)))
        .na.fill(0L)
    }
  )

  override def oracles: Map[String, String] = Map(

    "q127_funnel" ->
      """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS t, event_type FROM events),
          a AS (SELECT *, MIN(CASE WHEN event_type = 'view' THEN t END)
                  OVER (PARTITION BY user_id) AS tv FROM e),
          b AS (SELECT *, MIN(CASE WHEN event_type = 'click' AND t > tv THEN t END)
                  OVER (PARTITION BY user_id) AS tc FROM a),
          c AS (SELECT *, MIN(CASE WHEN event_type = 'purchase' AND t > tc THEN t END)
                  OVER (PARTITION BY user_id) AS tp FROM b),
          u AS (SELECT DISTINCT user_id, tv, tc, tp FROM c)
          SELECT COUNT(*) AS n_users, COUNT(tv) AS n_view,
                 COUNT(tc) AS n_click, COUNT(tp) AS n_purchase FROM u""",

    "q128_retention" ->
      """WITH e AS (SELECT user_id, date_trunc('week', CAST(ts AS TIMESTAMP)) AS wk FROM events),
          f AS (SELECT user_id, MIN(wk) AS cohort FROM e GROUP BY user_id),
          a AS (SELECT DISTINCT user_id, wk FROM e)
          SELECT cohort, CAST(date_diff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) AS BIGINT) AS offset_days,
                 COUNT(DISTINCT a.user_id) AS n_active
          FROM a JOIN f ON a.user_id = f.user_id
          GROUP BY 1, 2""",

    "q129_group_outliers" -> {
      val mean = Sql.davg("value")
      val vr = Sql.dvar("value")
      s"""WITH st AS (SELECT event_type, $mean AS mean, $vr AS var
                      FROM events GROUP BY event_type),
          z AS (SELECT e.event_type, round((e.value - st.mean) / sqrt(st.var), 6) AS z
                FROM events e JOIN st USING (event_type))
          SELECT event_type, COUNT(*) AS n,
                 COUNT(CASE WHEN abs(z) > 3 THEN 1 END) AS n_outliers,
                 round(MAX(abs(z)), 6) AS max_abs_z
          FROM z GROUP BY event_type"""
    },

    "q130_sketch_rollup" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                COUNT(DISTINCT user_id) AS n_exact, TRUE AS within_5pct
         FROM events GROUP BY 1""",

    "q131_interval_overlap" ->
      """WITH o AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS t FROM events),
          m AS (SELECT user_id, t,
                  CASE WHEN lag(t) OVER (PARTITION BY user_id ORDER BY t) IS NULL
                         OR t - lag(t) OVER (PARTITION BY user_id ORDER BY t) >= INTERVAL 30 MINUTE
                       THEN 1 ELSE 0 END AS ns
                FROM o),
          g AS (SELECT user_id, t,
                  SUM(ns) OVER (PARTITION BY user_id ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM m),
          sess AS (SELECT user_id, MIN(t) AS sess_start, MAX(t) + INTERVAL 30 MINUTE AS sess_end
                   FROM g GROUP BY user_id, sid),
          inc AS (SELECT event_id AS incident_id,
                    t - INTERVAL 30 MINUTE AS inc_start, t + INTERVAL 30 MINUTE AS inc_end
                  FROM o WHERE event_type = 'error' AND event_id % 50 = 0)
          SELECT DISTINCT user_id, sess_start, incident_id
          FROM sess JOIN inc
            ON sess_start <= inc_end AND inc_start <= sess_end""",

    "q136_transitions" ->
      """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS t, event_id FROM events),
          p AS (SELECT event_type,
                  lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id) AS next_type
                FROM e),
          c AS (SELECT event_type, next_type, COUNT(*) AS n FROM p
                WHERE next_type IS NOT NULL GROUP BY event_type, next_type),
          r AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS rt FROM c GROUP BY event_type)
          SELECT c.event_type, c.next_type, c.n,
                 CAST(c.n AS DOUBLE) / CAST(r.rt AS DOUBLE) AS p
          FROM c JOIN r ON c.event_type = r.event_type""",

    "q137_dynamic_pivot" ->
      """SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
                COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
                COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
                COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
                COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
         FROM events GROUP BY 1"""
  )
}
