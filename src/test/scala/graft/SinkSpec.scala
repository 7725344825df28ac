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

  test("ORC roundtrip preserves lineitem values and pushes the scan filter") {
    val d = sf("sf0.001")
    val df = graft.queries.ExtrasPack.queries("q77_orc_scan")(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    // filter + projection must reach the OrcScan, not run post-scan
    val scanLine = plan.linesIterator.find(_.contains("FileScan orc")).getOrElse("")
    assert(scanLine.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate"),
      s"shipdate predicate not pushed into the ORC scan: ${scanLine.take(600)}")
    assert(!scanLine.contains("l_orderkey"), // unused column pruned from ReadSchema
      s"column pruning failed on the ORC scan: ${scanLine.take(600)}")
    // and the ORC-read aggregate matches the same aggregate over parquet
    val fromParquet = graft.io.Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= lit("1997-01-01"))
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), graft.util.Parity.dsum(col("l_quantity")).as("qty"),
        graft.util.Parity.dsum(col("l_extendedprice")).as("revenue"))
    assert(df.exceptAll(fromParquet).isEmpty && fromParquet.exceptAll(df).isEmpty)
  }
}
