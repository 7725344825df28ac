package graft

import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.relational.Intervals

/** Wave-6 contracts: the banded interval join must not plan a cartesian
  * and must lose nothing vs the naive quadratic join; the funnel's window
  * chain must shuffle the events once, not once per stage.
  */
class BehaviorSpec extends SparkSpec {

  private def executedPlan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, sf("sf0.001"))
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q131 interval overlap never plans a cartesian / nested-loop join") {
    val p = executedPlan("q131_interval_overlap")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated:\n${p.take(800)}")
  }

  test("banded overlap join equals the naive quadratic join") {
    val d = sf("sf0.001")
    val ev = Tables.events(spark, d)
    val sessions = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("sw.start").as("sess_start"), col("sw.end").as("sess_end"))
    val incidents = ev
      .filter(col("event_type") === "error" && pmod(col("event_id"), lit(50)) === 0)
      .select(col("event_id").as("incident_id"),
        (col("ts") - expr("interval 30 minutes")).as("inc_start"),
        (col("ts") + expr("interval 30 minutes")).as("inc_end"))
    val banded = Intervals.overlapJoin(sessions, "sess_start", "sess_end",
        incidents, "inc_start", "inc_end")
      .select("user_id", "sess_start", "incident_id")
    val naive = sessions.crossJoin(incidents)
      .filter(col("sess_start") <= col("inc_end") && col("inc_start") <= col("sess_end"))
      .select("user_id", "sess_start", "incident_id")
    assert(banded.exceptAll(naive).isEmpty && naive.exceptAll(banded).isEmpty,
      "banded overlap join diverges from the naive join")
  }

  test("overlapJoin preserves duplicate input rows and rejects name clashes") {
    import spark.implicits._
    // two IDENTICAL left rows must each pair with the overlapping right
    // row — the former full-row distinct() collapsed them to one pair
    val l = Seq(("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
                ("a", "2024-01-01 10:00:00", "2024-01-01 12:00:00"))
      .toDF("tag", "ls", "le")
      .select(col("tag"), col("ls").cast("timestamp"), col("le").cast("timestamp"))
    val r = Seq(("x", "2024-01-01 11:00:00", "2024-01-01 11:30:00"))
      .toDF("rid", "rs", "re")
      .select(col("rid"), col("rs").cast("timestamp"), col("re").cast("timestamp"))
    assert(Intervals.overlapJoin(l, "ls", "le", r, "rs", "re").count() == 2)
    // multi-bin overlaps still emit exactly one pair per input pair
    // (canonical-bin predicate, not dedup): l spans 3 shared hour bins
    val wide = Seq(("b", "2024-01-01 09:30:00", "2024-01-01 11:45:00")).toDF("tag", "ls", "le")
      .select(col("tag"), col("ls").cast("timestamp"), col("le").cast("timestamp"))
    val rwide = Seq(("y", "2024-01-01 09:00:00", "2024-01-01 12:00:00")).toDF("rid", "rs", "re")
      .select(col("rid"), col("rs").cast("timestamp"), col("re").cast("timestamp"))
    assert(Intervals.overlapJoin(wide, "ls", "le", rwide, "rs", "re").count() == 1)
    // a shared column name must fail loudly, not silently misbind
    val clash = intercept[IllegalArgumentException] {
      Intervals.overlapJoin(l, "ls", "le",
        r.withColumnRenamed("rid", "tag"), "rs", "re")
    }
    assert(clash.getMessage.contains("tag"))
  }

  test("q127 funnel: three chained stage windows share ONE user shuffle") {
    val p = executedPlan("q127_funnel")
    val userExchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).length
    assert(userExchanges == 1,
      s"expected 1 user_id exchange for the window chain, found $userExchanges:\n${p.take(900)}")
  }
}
