package graft

import graft.streaming.Streams

/** Streaming crash-recovery, exercised rather than claimed: a query that
  * dies mid-replay — after a batch's output is visible in the sink but
  * before the batch commits — must restart from its checkpoint and land
  * on exactly the uninterrupted result. The composed quota pipeline is
  * the hardest case in the repo: four chained state stores (watermark
  * dedup, order-dependent quota admission ValueState, stream-static
  * join, windowed agg), where a recovery bug double-admits or re-emits.
  */
class RecoverySpec extends SparkSpec {

  private def straightRun(dir: String, name: String) =
    Streams.drainToParquet(
      Streams.composedAdmissionPipeline(spark, dir, 20L), name, "append")

  test("crash after batch 1 recovers from checkpoint to the uninterrupted result") {
    val dir = Streams.prepareLateArrivalFiles(spark, sf("sf0.001"))
    val straight = straightRun(dir, "rec_straight")
    val recovered = Streams.drainWithCrashRecovery(
      () => Streams.composedAdmissionPipeline(spark, dir, 20L),
      "rec_crash1", "append", crashAtBatch = 1L)
    assert(recovered.count() == straight.count())
    assert(recovered.exceptAll(straight).count() == 0)
    assert(straight.exceptAll(recovered).count() == 0)
  }

  test("crash in the final batch (after all watermark movement) also recovers") {
    // batch 2 carries the late arrivals; its replay must re-apply the
    // lagged watermark recovered from the offset WAL, not a reset one
    val dir = Streams.prepareLateArrivalFiles(spark, sf("sf0.001"))
    val straight = straightRun(dir, "rec_straight2")
    val recovered = Streams.drainWithCrashRecovery(
      () => Streams.composedAdmissionPipeline(spark, dir, 20L),
      "rec_crash2", "append", crashAtBatch = 2L)
    assert(recovered.count() == straight.count())
    assert(recovered.exceptAll(straight).count() == 0)
    assert(straight.exceptAll(recovered).count() == 0)
  }

  test("timer processor recovers: pending islands AND timers survive a crash") {
    // round-8 verdict item: nothing had ever restarted TimerSessionProcessor
    // from a checkpoint — timer re-registration and pending-island recovery
    // were untested. Crash after batch 1 (islands buffered, timers armed,
    // watermark moving): the rebuilt processor must emit exactly the
    // uninterrupted session set.
    val dir = Streams.prepareLateArrivalFiles(spark, sf("sf0.001"))
    val straight = Streams.drainToParquet(
      Streams.timerSessions(Streams.lateArrivalStream(spark, dir), 1800L),
      "timer_straight", "append")
    val recovered = Streams.drainWithCrashRecovery(
      () => Streams.timerSessions(Streams.lateArrivalStream(spark, dir), 1800L),
      "timer_crash1", "append", crashAtBatch = 1L)
    assert(straight.count() > 0, "no sessions closed — the timer path was not exercised")
    assert(recovered.count() == straight.count())
    assert(recovered.exceptAll(straight).count() == 0)
    assert(straight.exceptAll(recovered).count() == 0)
  }

  test("timer processor recovers from a crash in the FINAL batch too") {
    // batch 2 is the last data batch: its replay must restore the armed
    // timers and the WAL'd watermark so the trailing eviction still fires
    val dir = Streams.prepareLateArrivalFiles(spark, sf("sf0.001"))
    val straight = Streams.drainToParquet(
      Streams.timerSessions(Streams.lateArrivalStream(spark, dir), 1800L),
      "timer_straight2", "append")
    val recovered = Streams.drainWithCrashRecovery(
      () => Streams.timerSessions(Streams.lateArrivalStream(spark, dir), 1800L),
      "timer_crash2", "append", crashAtBatch = 2L)
    assert(recovered.count() == straight.count())
    assert(recovered.exceptAll(straight).count() == 0)
    assert(straight.exceptAll(recovered).count() == 0)
  }

  test("harness fails loudly when the crash batch is never reached") {
    // a silent pass here would mean q159 could 'verify' recovery on a
    // path that never crashed — the self-check must be loud instead
    val dir = Streams.prepareLateArrivalFiles(spark, sf("sf0.001"))
    intercept[IllegalStateException] {
      Streams.drainWithCrashRecovery(
        () => Streams.composedAdmissionPipeline(spark, dir, 20L),
        "rec_never", "append", crashAtBatch = 99L)
    }
  }
}
