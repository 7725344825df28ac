package graft

import org.apache.spark.sql.functions._

/** Sink-side physical guarantees: the partition-pruning query must push its
  * partition-column predicate to the scan as a PartitionFilter (directory
  * skip), not evaluate it as a post-scan filter.
  */
class SinkSpec extends SparkSpec {

  test("partition-column filter reaches the scan as a PartitionFilter") {
    val d = sf("sf0.001")
    val df = graft.queries.SinkPack.queries("q73_partition_pruning")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("o_orderstatus"),
      s"partition predicate not pushed to the scan: $pf")
    // and it actually prunes: the pruned count equals the plain filter count
    val expected = graft.io.Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F").count()
    assert(df.agg(sum("n")).head().getLong(0) == expected)
  }
}
