package graft

import org.apache.spark.sql.functions._

import graft.streaming.{StateReshard, Streams}

/** Checkpoint state re-shard, 8 → 16 stores, proven end to end (round-8
  * verdict item): the offline state read really reads the 8-store
  * checkpoint, the seeded continuation really plans 16 state partitions,
  * and the migrated job's final counts are bit-identical to an
  * uninterrupted run. See [[graft.streaming.StateReshard]] for the
  * mechanism and its documented API boundary.
  */
class StateReshardSpec extends SparkSpec {

  private def finals(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("user_id")
      .agg(max("n_seen").as("n_seen"), max("n_admitted").as("n_admitted"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("EVERY state store of the composed pipeline exports offline from its checkpoint") {
    // the read half of re-shard exists for ALL operators, including the
    // built-ins that expose no initial-state hook (the documented seeding
    // boundary): dedup state, the quota processor's ValueState, and the
    // windowed-agg state all come back as DataFrames from the checkpoint
    val d = sf("sf0.001")
    val dir = Streams.prepareLateArrivalFiles(spark, d)
    Streams.drainToParquet(
      Streams.composedAdmissionPipeline(spark, dir, 20L), "reshard_export", "append")
      .count()
    val ckpt = Streams.checkpointFor("reshard_export")
    val opIds = new java.io.File(s"$ckpt/state").listFiles()
      .filter(_.isDirectory).map(_.getName.toInt).sorted
    assert(opIds.length == 3,
      s"expected 3 stateful operators (dedup, quota, window agg), found ${opIds.mkString(",")}")
    // the transformWithState store identifies itself: a plain load()
    // fails there (state is per-variable) and succeeds on the built-ins
    var quotaOp = -1
    val stores = opIds.map { op =>
      val base = spark.read.format("statestore")
        .option("path", ckpt).option("operatorId", op)
      val df = try base.load()
      catch { case _: Throwable =>
        quotaOp = op
        base.option("stateVarName", "admitted").load()
      }
      op -> df
    }.toMap
    // every store READS successfully; emptiness is allowed for the
    // watermark-evicting built-ins (an empty post-seal dedup/agg store is
    // the bounded-state property working, not an export failure) but the
    // checkpoint as a whole must hold state
    val counts = stores.map { case (op, df) => op -> df.count() }
    assert(counts.values.sum > 0, s"no operator exported any state rows: $counts")
    assert(quotaOp >= 0, "no transformWithState store found among the operators")
    assert(counts(quotaOp) > 0, "quota store exported no rows")
    // strong invariant on the quota store: one ValueState[Long] per user,
    // every admitted count within the quota
    val quotaCounts = stores(quotaOp)
      .select(col("value").getField("value").cast("long").as("admitted"))
      .collect().map(_.getLong(0))
    assert(quotaCounts.nonEmpty && quotaCounts.forall(c => c >= 0 && c <= 20),
      s"quota ValueState out of bounds: ${quotaCounts.take(5).mkString(",")}")
  }

  test("8-store quota state migrates to 16 stores with bit-identical results") {
    val d = sf("sf0.001")
    val (histDir, tailDir) = Streams.prepareReshardSplit(spark, d)
    val fullDir = Streams.prepareLateArrivalFiles(spark, d)

    // control: uninterrupted 8-store run over all three batches
    val control = finals(Streams.drainToTable(
      Streams.quotaAdmission(Streams.lateArrivalStream(spark, fullDir), 20L),
      "reshard_ctl", "update"))

    // phase 1: 8 stores over the history
    val phase1 = Streams.drainToTable(
      Streams.quotaAdmission(Streams.lateArrivalStream(spark, histDir), 20L),
      "reshard_p1", "update")

    // offline state read from the phase-1 checkpoint
    val state = StateReshard.readValueState(
      spark, Streams.checkpointFor("reshard_p1"), "seen")
    val stateRows = state.collect()
    assert(stateRows.nonEmpty, "offline state read returned nothing")
    val partsSeen = stateRows.map(_.getInt(0)).distinct
    assert(partsSeen.forall(p => p >= 0 && p < 8),
      s"phase-1 state claims partitions outside 0..7: ${partsSeen.sorted.mkString(",")}")
    // the state IS phase 1's final n_seen per user
    val fromState = stateRows.map(r => (r.getLong(1), r.getLong(2))).toMap
    val fromUpdates = phase1.groupBy("user_id").agg(max("n_seen").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(fromState == fromUpdates,
      "offline-read ValueState disagrees with the emitted running counts")

    // phase 2: seeded continuation on 16 stores over the tail
    spark.conf.set("graft.streaming.statePartitions", "16")
    val phase2 =
      try Streams.drainToTable(
        Streams.quotaAdmissionSeeded(
          Streams.lateArrivalStream(spark, tailDir), 20L,
          state.select(col("key").as("user_id"), col("value").as("n_seen"))),
        "reshard_p2", "update")
      finally spark.conf.unset("graft.streaming.statePartitions")

    // the new checkpoint really has 16 state-store instances
    val stateDirs = new java.io.File(s"${Streams.checkpointFor("reshard_p2")}/state/0")
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.forall(_.isDigit))
    assert(stateDirs.map(_.toInt).sorted.toSeq == (0 until 16),
      s"expected 16 state partitions, found: ${stateDirs.sorted.mkString(",")}")

    // migrated finals == uninterrupted finals
    val f1 = phase1.groupBy("user_id")
      .agg(max("n_seen").as("n_seen"), max("n_admitted").as("n_admitted"))
    val f2 = phase2.groupBy("user_id")
      .agg(max("n_seen").as("n_seen"), max("n_admitted").as("n_admitted"))
    val migrated = finals(f1.join(f2, Seq("user_id"), "left_anti").unionByName(f2))
    assert(migrated == control,
      s"re-sharded run diverged: ${(migrated diff control).take(5)} vs ${(control diff migrated).take(5)}")
  }

  test("timer re-shard migrates LIVE islands: offline read non-empty, seeded phase closes them on 16 stores") {
    // guards q180 against silently becoming a no-op migration: islands
    // must actually cross the boundary, and the SEEDED phase must close
    // them — proving the restored ListState and the re-armed timers both
    // work on the new store count
    val d = sf("sf0.001")
    val (histDir, tailDir) = Streams.prepareTimerReshardSplit(spark, d)
    Streams.drainToParquet(
      Streams.timerSessions(Streams.lateArrivalStream(spark, histDir), 1800L),
      "timrsh_spec8", "append").count()
    val islands = StateReshard.readListState(
        spark, Streams.checkpointFor("timrsh_spec8"), "pending")
      .withColumnRenamed("key", "user_id")
    val crossed = islands.collect().map(r =>
      (r.getLong(0), r.getLong(r.fieldIndex("start_us")))).toSet
    assert(crossed.nonEmpty,
      "no live islands crossed the boundary — the migration exercises nothing")
    spark.conf.set("graft.streaming.statePartitions", "16")
    val phase2 =
      try Streams.drainToParquet(
        Streams.timerSessionsSeeded(Streams.lateArrivalStream(spark, tailDir), 1800L, islands),
        "timrsh_spec16", "append")
      finally spark.conf.unset("graft.streaming.statePartitions")
    val stateDirs = new java.io.File(s"${Streams.checkpointFor("timrsh_spec16")}/state/0")
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.forall(_.isDigit))
    assert(stateDirs.map(_.toInt).sorted.toSeq == (0 until 16),
      s"expected 16 state partitions, found: ${stateDirs.sorted.mkString(",")}")
    // at least one MIGRATED island closed in phase 2 (same user + start —
    // batch-2 rows are 7 days away, so a migrated island closes as-is)
    val closed = phase2.select("user_id", "session_start_us").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(closed.intersect(crossed).nonEmpty,
      "no migrated island was closed by the seeded phase — timers not re-armed?")
  }
}
