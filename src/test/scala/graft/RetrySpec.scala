package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

import graft.util.Parity

object RetrySpec {
  /** Counts injected failures; local-mode executors share this JVM. */
  @volatile var fired: Int = 0
}

/** Determinism under task retries — a 100 TB correctness class that
  * `local[n]` (maxFailures=1) can never surface: a failed task is
  * RECOMPUTED from the scan, and any nondeterministic decision in the
  * lineage (rand(), RNG sampling, unstable ordering) can admit a
  * DIFFERENT row set on the retry — silently corrupting samples, splits,
  * and dedup on a cluster where lost executors are routine. The engine's
  * sampling/split/shuffle decisions are keyHash-derived precisely so
  * recomputation is idempotent; this spec injects a first-attempt task
  * failure (via the test session's `local[n,2]` master) and asserts
  * bit-identical results.
  */
class RetrySpec extends SparkSpec {

  /** doc_ids with a first-attempt failure injected into one task. */
  private def docIds(inject: Boolean) = {
    import spark.implicits._
    val base = graft.io.Tables.documents(spark, sf("sf0.01"))
      .select(col("doc_id").cast("long")).as[Long]
    if (!inject) base
    else base.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
        RetrySpec.fired += 1
        throw new RuntimeException("injected first-attempt failure")
      }
      it
    }
  }

  test("keyHash sampling admits the identical row set under a task retry") {
    val before = RetrySpec.fired
    def sample(inject: Boolean) = docIds(inject).toDF("doc_id")
      .filter(pmod(Parity.keyHash(col("doc_id")), lit(100L)) < 37)
      .orderBy("doc_id").collect().toSeq
    val clean = sample(inject = false)
    val retried = sample(inject = true)
    assert(RetrySpec.fired > before, "injection never fired — retry path not exercised")
    assert(clean.nonEmpty && retried == clean)
  }

  test("epoch shuffle (q161) placements are identical under a task retry") {
    val before = RetrySpec.fired
    // same shard/pos formula as q161, over an injected scan
    def placements(inject: Boolean) = docIds(inject).toDF("doc_id")
      .withColumn("h", Parity.keyHash(col("doc_id")))
      .withColumn("shard", pmod(col("h"), lit(8L)))
      .orderBy("doc_id").collect().toSeq
    val clean = placements(inject = false)
    val retried = placements(inject = true)
    assert(RetrySpec.fired > before, "injection never fired — retry path not exercised")
    assert(clean.nonEmpty && retried == clean)
  }

  test("a REDUCE-stage retry (post-shuffle task failure) is also idempotent") {
    // the failure lands AFTER the exchange: the retried task re-fetches
    // its shuffle blocks and re-reduces — the recompute path a lost
    // executor takes mid-aggregation on a real cluster
    import spark.implicits._
    val before = RetrySpec.fired
    def agg(inject: Boolean) = {
      val folded = docIds(inject = false).toDF("doc_id")
        .withColumn("fold", pmod(Parity.keyHash(col("doc_id")), lit(7L)))
        .groupBy("fold").agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
        .as[(Long, Long, Long)]
      val maybeInjected =
        if (!inject) folded
        else folded.mapPartitions { it =>
          val tc = TaskContext.get()
          if (tc.partitionId() == 0 && tc.attemptNumber() == 0) {
            RetrySpec.fired += 1
            throw new RuntimeException("injected reduce-stage failure")
          }
          it
        }
      maybeInjected.collect().toSeq.sortBy(_._1)
    }
    val clean = agg(inject = false)
    val retried = agg(inject = true)
    assert(RetrySpec.fired > before, "reduce-stage injection never fired")
    assert(clean.nonEmpty && retried == clean)
  }

  test("deterministic split assignment survives a retry mid-aggregation") {
    val before = RetrySpec.fired
    def foldCounts(inject: Boolean) = docIds(inject).toDF("doc_id")
      .withColumn("fold", pmod(Parity.keyHash(col("doc_id")), lit(5L)))
      .groupBy("fold").count().orderBy("fold").collect().toSeq
    val clean = foldCounts(inject = false)
    val retried = foldCounts(inject = true)
    assert(RetrySpec.fired > before, "injection never fired — retry path not exercised")
    assert(clean.nonEmpty && retried == clean)
  }
}
