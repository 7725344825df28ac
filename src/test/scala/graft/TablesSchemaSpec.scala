package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events readers' ts-schema contract: the driver has shipped
  * `events.ts` as parquet TIMESTAMP(NANOS) (read as long nanos via the
  * legacy conf, rounds 1–5) and as TIMESTAMP(MICROS) → TIMESTAMP_NTZ
  * (round 6+). [[graft.io.Tables.events]] and
  * [[graft.streaming.Streams.eventsStream]] must surface the SAME
  * TimestampType column with the SAME instants for both layouts — a
  * regen that flips the physical type again must not change ANY query
  * result. This spec synthesizes both layouts from one instant set and
  * asserts the surfaced values are identical.
  */
class TablesSchemaSpec extends SparkSpec {

  private def writeVariants(): (String, String) = {
    import spark.implicits._
    val base = Files.createTempDirectory("graft_ts_spec").toString
    val micros = Seq(
      (1L, 1700000000000000L), (2L, 1700000123456789L), (3L, 1701234567890123L))
      .toDF("event_id", "us")
    // variant A: long nanos (what nanosAsLong surfaces for TIMESTAMP(NANOS))
    val nanosDir = s"$base/nanos"
    micros.select(col("event_id"), (col("us") * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$nanosDir/events.parquet")
    // variant B: TIMESTAMP_NTZ micros (the round-6 layout)
    val ntzDir = s"$base/ntz"
    micros.select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$ntzDir/events.parquet")
    (nanosDir, ntzDir)
  }

  test("Tables.events surfaces identical TimestampType instants for both ts layouts") {
    val (nanosDir, ntzDir) = writeVariants()
    val a = graft.io.Tables.events(spark, nanosDir)
    val b = graft.io.Tables.events(spark, ntzDir)
    assert(a.schema("ts").dataType == TimestampType, s"nanos layout: ${a.schema("ts").dataType}")
    assert(b.schema("ts").dataType == TimestampType, s"ntz layout: ${b.schema("ts").dataType}")
    val av = a.select("event_id", "ts").orderBy("event_id").collect().toSeq
    val bv = b.select("event_id", "ts").orderBy("event_id").collect().toSeq
    assert(av == bv, s"instants diverge:\n  nanos: $av\n  ntz:   $bv")
  }

  test("Tables.events is session-timezone independent and leaves the caller's zone untouched") {
    // round-6 review: the reader used to pin spark.sql.session.timeZone
    // to UTC globally — correct instants, but it silently changed ALL of
    // a non-UTC caller session's timestamp semantics. Now the NTZ cast
    // is column-scoped: same instants under any session zone, caller's
    // zone preserved.
    val (nanosDir, ntzDir) = writeVariants()
    val utc = graft.io.Tables.events(spark, ntzDir)
      .select("event_id", "ts").orderBy("event_id").collect().toSeq
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val offset = graft.io.Tables.events(spark, ntzDir)
        .select("event_id", "ts").orderBy("event_id").collect().toSeq
      assert(spark.conf.get(tzKey) == "America/New_York",
        "reader mutated the caller's session timezone")
      // Row.toString renders session-zone walls; compare epoch instants
      val offsetUs = graft.io.Tables.events(spark, ntzDir)
        .select(col("event_id"), unix_micros(col("ts")).as("us")).orderBy("event_id")
        .collect().toSeq
      spark.conf.set(tzKey, saved)
      val utcUs = graft.io.Tables.events(spark, ntzDir)
        .select(col("event_id"), unix_micros(col("ts")).as("us")).orderBy("event_id")
        .collect().toSeq
      assert(offsetUs == utcUs,
        s"instants shift with session zone:\n  ET:  $offsetUs\n  UTC: $utcUs")
      // the long-nanos layout is epoch-based and must agree too
      spark.conf.set(tzKey, "Asia/Tokyo")
      val nanosUs = graft.io.Tables.events(spark, nanosDir)
        .select(col("event_id"), unix_micros(col("ts")).as("us")).orderBy("event_id")
        .collect().toSeq
      assert(nanosUs == utcUs)
    } finally spark.conf.set(tzKey, saved)
    assert(utc.nonEmpty)
  }

  test("Streams.eventsStream surfaces identical instants for both ts layouts") {
    val (nanosDir, ntzDir) = writeVariants()
    def drained(dir: String, name: String) =
      graft.streaming.Streams.drainToTable(
          graft.streaming.Streams.eventsStream(spark, dir), name, "append")
        .select("event_id", "ts").orderBy("event_id").collect().toSeq
    val av = drained(nanosDir, "ts_spec_nanos")
    val bv = drained(ntzDir, "ts_spec_ntz")
    assert(av == bv, s"streamed instants diverge:\n  nanos: $av\n  ntz:   $bv")
  }
}
