package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.relational.Skew

/** Skew-robustness proof: every other scale sweep in this repo uses
  * uniform-ish synthetic keys, but a real events/corpus table is
  * zipf-distributed — so this main sweeps a PLANTED hot key from 0% to
  * 30% of an events table (default 2M rows; the BASELINE.md round-6
  * table uses 8M, zipf tail for the rest) and measures the three shapes
  * that hot keys break, printing one JSON line per (arm, hotShare) cell:
  *
  *  - arm "join": a shuffle equi-join on the skewed key (the q123/q151
  *    shape once their grams/users go zipf). AQE skew-split is the
  *    mitigation; each cell times the identical query with the rule OFF
  *    then ON (the delta is the mitigation's value) and records whether
  *    the final adaptive plan actually engaged it (`skew=true` on the SMJ
  *    node) — thresholds are tuned down to bench scale (2 MB compressed)
  *    because the defaults (256 MB) are sized for production partitions,
  *    and the point is to prove the MECHANISM engages, not to ship tuned
  *    thresholds.
  *  - arm "window": the q127 funnel's chained per-user windows vs the
  *    cascade-of-aggregations formulation. Window partitions cannot be
  *    split, so the hot user serializes one task; the aggregation form
  *    keeps map-side partial combine. Both results are asserted equal.
  *  - arm "lead": the q136 transitions lead() vs [[Skew.chunkedLead]]
  *    with a day bucket (per-key window partitions bounded by
  *    events/user/day). Transition counts asserted equal.
  *
  * Deterministic generator (no rand()): hash fractions drive user
  * assignment — hotShare of events land on user 0, the rest on a
  * U^frac zipf-ish tail over ~n/50 users. Numbers recorded in
  * BASELINE.md; not part of the per-round driver protocol.
  * Env: SPARK_GRAFT_CPUS, SPARK_GRAFT_SKEW_N, SPARK_GRAFT_SKEW_SHARES.
  */
object SkewBench {

  def genEvents(spark: SparkSession, n: Long, hotShare: Double): DataFrame = {
    val users = math.max(50L, n / 50)
    spark.range(n).select(
        col("id").as("event_id"),
        pmod(col("id") * lit(2654435761L), lit(1000000007L)).as("h1"),
        pmod((col("id") + lit(7)) * lit(1099511628211L), lit(998244353L)).as("h2"))
      .select(
        col("event_id"),
        when(pmod(col("h1"), lit(1000)) < lit((hotShare * 1000).round),
          lit(0L))
          .otherwise(exp((col("h2").cast("double") / lit(998244353.0)) * log(lit(users.toDouble)))
            .cast("long")).as("user_id"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase"), lit("signup"), lit("error")),
          (pmod(col("h1"), lit(5)) + 1).cast("int")).as("event_type"),
        timestamp_seconds(lit(1700000000L) + pmod(col("h2"), lit(86400L * 30))).as("ts"),
        // real-entropy payload (~30 B of varied digits): the join arm must
        // shuffle bytes that don't compress away, or the hot partition of
        // identical user_id longs lands under the skew threshold and the
        // split never engages (the same pruning defect the SkewSpec AQE
        // test had)
        concat_ws("_", lit("pl"), col("h1"), col("h2"), col("event_id")).as("payload"))
      .repartition(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
  }

  /** q127's funnel via chained per-user windows (the pack formulation). */
  def funnelByWindow(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    ev.withColumn("tv", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("tc", min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).over(w))
      .withColumn("tp", min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).over(w))
      .select("user_id", "tv", "tc", "tp").distinct()
      .agg(count(lit(1)).as("n_users"), count(col("tv")).as("n_view"),
        count(col("tc")).as("n_click"), count(col("tp")).as("n_purchase"))
  }

  /** The same funnel as a cascade of hash aggregations: three user-keyed
    * aggregates with map-side partial combine (skew-immune — a hot user's
    * rows pre-combine inside every map task) at the cost of re-shuffling
    * the events per stage. The right trade at zipf keys; the window form
    * is cheaper at uniform keys (one shuffle total). */
  def funnelByAgg(ev: DataFrame): DataFrame = {
    val a1 = ev.groupBy("user_id")
      .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"))
    val a2 = ev.join(a1, "user_id").groupBy("user_id")
      .agg(min(col("tv")).as("tv"),
        min(when(col("event_type") === "click" && col("ts") > col("tv"), col("ts"))).as("tc"))
    val a3 = ev.join(a2, "user_id").groupBy("user_id")
      .agg(min(col("tv")).as("tv"), min(col("tc")).as("tc"),
        min(when(col("event_type") === "purchase" && col("ts") > col("tc"), col("ts"))).as("tp"))
    a3.agg(count(lit(1)).as("n_users"), count(col("tv")).as("n_view"),
      count(col("tc")).as("n_click"), count(col("tp")).as("n_purchase"))
  }

  /** q136's transition counts from a configurable lead column. */
  def transitions(withNext: DataFrame): DataFrame =
    withNext.filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))

  def plainLead(ev: DataFrame): DataFrame =
    ev.withColumn("next_type",
      lead(col("event_type"), 1).over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_N", "2000000").toLong
    val shares = sys.env.getOrElse("SPARK_GRAFT_SKEW_SHARES", "0.0,0.01,0.1,0.3")
      .split(",").map(_.trim.toDouble).toSeq
    val spark = graft.core.GraftSession.configure(
        org.apache.spark.sql.SparkSession.builder().master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench-scale skew thresholds (defaults are sized for 100 TB
    // partitions, 256 MB): engage the skew-split mechanism on ~2 MB
    // COMPRESSED shuffle partitions — shuffle sizes are post-lz4, and the
    // ~45 B/row hot partition compresses ~3-4×, so an 8 MB threshold needs
    // >700k hot rows to trip while 2 MB trips from ~10% hot share at n=2M
    val skewThreshold = sys.env.getOrElse("SPARK_GRAFT_SKEW_THRESHOLD", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", skewThreshold)
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", skewThreshold)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    // untimed warmup at n/10: JIT + codegen + shuffle-service spin-up land
    // here, not in the first sweep cell (the r6 run's first cell was ~2×
    // its steady-state time before this)
    locally {
      val w = genEvents(spark, math.max(100000L, n / 10), 0.05).persist()
      w.count()
      val wu = math.max(50L, n / 500)
      val dim = spark.range(wu + 1)
        .select(col("id").as("user_id"), pmod(col("id"), lit(7)).as("segment"))
      w.join(dim.hint("merge"), "user_id")
        .groupBy("segment").agg(count(lit(1)).as("n"), max(length(col("payload"))).as("max_len"))
        .write.format("noop").mode("overwrite").save()
      funnelByWindow(w).collect()
      funnelByAgg(w).collect()
      transitions(plainLead(w)).collect()
      transitions(Skew.chunkedLead(w, "user_id", "ts", "event_id", "event_type",
        date_trunc("day", col("ts")), "next_type")).collect()
      w.unpersist()
    }

    for (p <- shares) {
      val ev = genEvents(spark, n, p).persist()
      ev.count()
      try {
        // ── join arm: skewed shuffle join, AQE skew-split expected ──────
        // max(length(payload)) keeps the payload column alive through the
        // join exchange — without it Catalyst prunes everything but
        // user_id/segment and the hot partition compresses below threshold.
        // The dim is built INDEPENDENTLY (a range superset of the user
        // space), not as ev.select("user_id").distinct(): OptimizeSkewedJoin
        // splits a skewed partition by re-reading the OTHER side's shuffle
        // map output in slices, so it only matches an SMJ whose children
        // are both fresh shuffle stages — a dim whose distinct() aggregate
        // sits inline above its shuffle, OR a cached dim whose preserved
        // hash-partitioning elides the exchange entirely, silently disables
        // the split AT ANY threshold (both shapes verified in round 6, see
        // BASELINE.md). Production rule: a skewed join whose other side is
        // a same-stage aggregate or a co-partitioned cache must break that
        // partitioning or salt explicitly — AQE will not save it.
        val users = math.max(50L, n / 50)
        val dim = spark.range(users + 1)
          .select(col("id").as("user_id"), pmod(col("id"), lit(7)).as("segment"))
        def joinOnce(): Unit =
          ev.join(dim.hint("merge"), "user_id")
            .groupBy("segment").agg(count(lit(1)).as("n"), max(length(col("payload"))).as("max_len"))
            .write.format("noop").mode("overwrite").save()
        // A/B: identical query with the skew-split rule off, then on —
        // the wall-time delta IS the mitigation's value at this hot share
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        val (_, tJoinOff) = time(joinOnce())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        val (_, tJoin) = time(joinOnce())
        val plan = {
          val df = ev.join(dim.hint("merge"), "user_id")
            .groupBy("segment").agg(count(lit(1)).as("n"), max(length(col("payload"))).as("max_len"))
          df.collect()
          df.queryExecution.executedPlan.toString
        }
        val skewEngaged = plan.contains("skew=true")
        if (sys.env.get("SPARK_GRAFT_SKEW_DEBUG").contains("1"))
          System.err.println(s"SKEWDEBUG hot_share=$p plan:\n$plan")
        println(s"""{"bench":"skew","arm":"join","n":$n,"hot_share":$p,"sec":${f"$tJoin%.2f"},"sec_split_off":${f"$tJoinOff%.2f"},"skew_split_engaged":$skewEngaged}""")

        // ── window arm: funnel window vs aggregation cascade ────────────
        val (wRow, tWin) = time(funnelByWindow(ev).collect().head)
        val (aRow, tAgg) = time(funnelByAgg(ev).collect().head)
        require(wRow == aRow, s"funnel formulations diverge: $wRow vs $aRow")
        println(s"""{"bench":"skew","arm":"window","n":$n,"hot_share":$p,"window_sec":${f"$tWin%.2f"},"agg_sec":${f"$tAgg%.2f"}}""")

        // ── lead arm: plain lead vs chunkedLead(day bucket) ─────────────
        val (plainRows, tPlain) = time(
          transitions(plainLead(ev)).orderBy("event_type", "next_type").collect().toSeq)
        val (chunkRows, tChunk) = time(
          transitions(Skew.chunkedLead(ev, "user_id", "ts", "event_id", "event_type",
              date_trunc("day", col("ts")), "next_type"))
            .orderBy("event_type", "next_type").collect().toSeq)
        require(plainRows == chunkRows,
          s"chunkedLead diverges from plain lead (${plainRows.size} vs ${chunkRows.size} rows)")
        println(s"""{"bench":"skew","arm":"lead","n":$n,"hot_share":$p,"plain_sec":${f"$tPlain%.2f"},"chunked_sec":${f"$tChunk%.2f"}}""")
      } finally ev.unpersist()
    }
    spark.stop()
  }
}
