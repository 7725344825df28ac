package graft.util

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Surfaces task failures that the `local[n,2]` test master would
  * otherwise retry SILENTLY (round-7 review): with two task attempts, a
  * transiently-failing task that used to fail a test loudly can pass on
  * its retry, masking flaky nondeterminism outside the keyHash-guarded
  * paths RetrySpec covers. Every `ExceptionFailure` task attempt is
  * counted here and [[graft.SparkSpec]]'s fixture hook fails the first
  * test after which one is visible.
  *
  * Convention: test code that fails a task ON PURPOSE (RetrySpec's
  * first-attempt throws, StatePartitionsSpec's raise_error drain) marks
  * the error message with "injected" — those attempts are excluded.
  * `TaskKilled`/`TaskCommitDenied` collateral from an aborting stage is
  * not counted either: it is cleanup of a failure already surfaced, not
  * independent evidence of flakiness.
  *
  * Listener delivery is async (Spark's listener bus), so an unexpected
  * failure may surface one test late — it still surfaces, which is the
  * point. */
object TaskFailureAudit {

  private val observed = new AtomicLong(0)
  @volatile private var installed = false

  /** Failed attempts beyond the declared injections (>0 ⇒ something
    * failed and was retried without any test noticing). */
  def unexpected(): Long = observed.get()

  def install(spark: SparkSession): Unit = synchronized {
    if (!installed) {
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onTaskEnd(e: SparkListenerTaskEnd): Unit = e.reason match {
          // the "injected" marker may sit in the CAUSE chain rather than
          // the top-level message (e.g. a broadcast's "Exception thrown
          // in awaitResult:" wrapping a FAILED_READ_FILE whose path names
          // the injecting fixture) — check the full stack trace too
          case f: org.apache.spark.ExceptionFailure
              if !f.description.contains("injected") &&
                !f.fullStackTrace.contains("injected") =>
            observed.incrementAndGet(); ()
          case _ => ()
        }
      })
      installed = true
    }
  }
}
