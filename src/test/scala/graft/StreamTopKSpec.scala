package graft

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** q163: the custom TypedImperativeAggregate's partial states round-trip
  * through the STREAMING state store (complete-mode agg over a 3-batch
  * replay) and must land on exactly the batch plan's shuffle-merged
  * result — batch-boundary invariance of the mergeable heap state.
  */
class StreamTopKSpec extends SparkSpec {

  test("streaming top-k agg (3-batch state merge) equals the batch shuffle merge") {
    val d = sf("sf0.001")
    val streamed = SparkEntry.queries("q163_stream_topk_agg")(spark, d)
    val dir = Streams.prepareLateArrivalFiles(spark, d)
    val batch = spark.read.parquet(dir)
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("n"),
        org.apache.spark.sql.graft.TopKCollect(
          graft.util.Parity.keyHash(col("event_id")), col("event_id"),
          col("user_id"), 10).as("kept"))
      .select(col("window.start").as("win_start"), col("n"), posexplode(col("kept")))
      .select(col("win_start"), col("n"), (col("pos") + 1).cast("long").as("pos"),
        col("col.id").as("event_id"), col("col.payload").as("user_id"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0,
      "streaming state-store merge diverged from the batch merge")
  }
}
