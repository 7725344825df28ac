package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface (SURVEY §2.10): the reference is batch-only,
  * so this coverage is driven by the events table — tumbling/sliding/session
  * windows, streaming dedup, watermarks.
  *
  * Local harness: a file-source stream over the events parquet, drained
  * synchronously into a memory sink (`processAllAvailable`), then returned
  * as a DataFrame. The same transformations run unchanged against a real
  * unbounded source (kafka/files) on a cluster — that is the point of the
  * unified Dataset API.
  */
object Streams {

  /** File-source stream over events.parquet with the ns→µs conversion
    * (same schema dance as [[graft.io.Tables.events]]). */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    // the file source wants a directory: stream the sf dir, filtered down
    // to the events file(s)
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Drain a (bounded) stream into a memory sink and return the result.
    * `outputMode` complete for aggregations, append for row streams. */
  def drainToTable(df: DataFrame, name: String, outputMode: String): DataFrame = {
    val spark = df.sparkSession
    val qname = s"${name}_${System.nanoTime()}" // unique per invocation
    val q = df.writeStream
      .format("memory").queryName(qname).outputMode(outputMode)
      .option("checkpointLocation", s"/root/repo/target/scratch/ckpt_$qname")
      .start()
    try { q.processAllAvailable() } finally { q.stop() }
    spark.table(qname)
  }

  /** Tumbling-window aggregation (`window(ts, size)`). */
  def tumblingCounts(events: DataFrame, size: String): DataFrame =
    events.groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,4)")).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Sliding-window aggregation. */
  def slidingCounts(events: DataFrame, size: String, slide: String): DataFrame =
    events.groupBy(window(col("ts"), size, slide))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Session windows per user (gap-based sessionization). */
  def userSessions(events: DataFrame, gap: String): DataFrame =
    events.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_micros(col("session_window.start")).as("session_start_us"), col("n"))

  /** Streaming dedup on a key subset (state-backed `dropDuplicates`). */
  def dedupStream(events: DataFrame, keys: Seq[String]): DataFrame =
    events.select(keys.map(col): _*).dropDuplicates(keys)

  case class UserState(n: Long, types: Seq[String])

  /** Custom keyed state via `mapGroupsWithState` (the brief's
    * `KeyValueGroupedDataset` surface): per-user running event count and
    * distinct-type count, maintained in a `GroupState` the engine
    * checkpoints and recovers. Output mode: update. */
  def statefulUserActivity(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id").cast("long"), col("event_type")).as[(Long, String)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[(Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, Seq.empty))
          val evs = it.toSeq
          val next = UserState(prev.n + evs.size, (prev.types ++ evs.map(_._2)).distinct)
          state.update(next)
          (uid, next.n, next.types.size.toLong)
      }
      .toDF("user_id", "n_events", "n_types")
  }
}
