package graft

/** Physical-plan contracts for the shapes that matter at 100 TB: the
  * lookup join must broadcast (never shuffle the big side), the IVF ANN
  * path must never degenerate to a cartesian, the brute-force baseline is
  * pinned AS the documented cartesian, top-k must plan as TakeOrdered
  * (per-partition top-k, no global sort), and filters/projections must
  * reach the parquet scan. Complements ScaleSpec's zero-exchange bucketed
  * join and SinkSpec's partition-pruning / ORC-pushdown assertions.
  */
class PlanSpec extends SparkSpec {

  /** FINAL adaptive plan: AQE re-plans at runtime (e.g. sort-merge →
    * broadcast once sizes are known), so the query is executed first and
    * the finalized plan inspected. */
  private def plan(q: String): String = {
    val d = sf("sf0.001")
    val df = SparkEntry.queries(q)(spark, d)
    df.collect()
    // keep only the finalized section — the trailing "== Initial Plan =="
    // dump still names the pre-AQE operators
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
  }

  test("q02 lookup join broadcasts the dimension, never shuffles the fact side") {
    val p = plan("q02_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin"), s"lookup join degraded to sort-merge:\n${p.take(600)}")
  }

  test("q119 CDC apply never shuffles the base table (all joins broadcast)") {
    val p = plan("q119_cdc_apply")
    assert(p.contains("BroadcastHashJoin"), p.take(600))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"CDC apply shuffled the base table:\n${p.take(800)}")
  }

  test("q04 anti join resolves as a real anti join, not a subquery rescan") {
    val p = plan("q04_customers_without_orders")
    assert(p.contains("LeftAnti"), p.take(600))
  }

  test("q67 IVF candidate join never degenerates to a cartesian") {
    val p = plan("q67_ivf_ann")
    assert(!p.contains("CartesianProduct"), p.take(800))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(800))
    assert(p.contains("BroadcastHashJoin"), // probes broadcast onto the bucketed corpus
      s"IVF probe join should broadcast:\n${p.take(800)}")
  }

  test("q35 brute-force baseline is the documented broadcast cross product") {
    val p = plan("q35_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("CartesianProduct"),
      s"q35 is expected to be the exact cross-product baseline:\n${p.take(800)}")
  }

  test("q161 epoch shuffle pays ONE keyed exchange and no global sort") {
    val p = plan("q161_epoch_shuffle")
    assert(!p.contains("Exchange rangepartitioning"),
      s"epoch shuffle must not pay a range exchange (global sort):\n${p.take(800)}")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges == 1,
      s"expected exactly 1 keyed exchange, found $hashExchanges:\n${p.take(800)}")
  }

  test("q05 top-k plans as TakeOrdered, not a global sort") {
    val p = plan("q05_top_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(600))
    assert(!p.contains("Exchange rangepartitioning"),
      s"top-k should not global-sort:\n${p.take(600)}")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // At cluster scale a selective dim filter should reach the fact scan as
    // an injected bloom filter (Catalyst's InjectRuntimeFilter) — rows that
    // can't join are dropped BEFORE the shuffle. The thresholds are sized
    // for real data (fact side ≥ 10 GB by default), so pin them down to
    // make the optimization observable on the test corpus; the assertion is
    // about the PLAN SHAPE the engine gets for free at 100 TB.
    import org.apache.spark.sql.functions._
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle join shape
      val d = sf("sf0.01")
      val orders = graft.io.Tables.orders(spark, d).filter(col("o_totalprice") > 400000.0)
      val li = graft.io.Tables.lineitem(spark, d)
      val j = li.join(orders, li("l_orderkey") === orders("o_orderkey"))
        .agg(sum("l_quantity").as("q"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected an injected bloom filter on the fact side:\n${optimized.take(1200)}")
      j.collect() // and the filtered plan still executes
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("q123 collapses bigrams per doc BEFORE any gram-keyed join") {
    // the round-6 restructure's load-bearing property: a hot bigram must
    // contribute |docs| rows to the join, not |occurrences| — the exploded
    // stream has to aggregate on (doc_id, b) before the first join (AQE
    // skew-split cannot rescue these aggregate-fed joins, see SkewSpec)
    val p = plan("q123_bigram_lm_score")
    val aggIdx = "HashAggregate\\(keys=\\[doc_id#\\d+L?, b#\\d+\\]".r
      .findFirstMatchIn(p).map(_.start)
    val joinIdx = Seq("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
      .flatMap(op => { val i = p.indexOf(op); if (i >= 0) Some(i) else None })
      .minOption
    assert(aggIdx.isDefined, s"no per-(doc_id, b) aggregate in plan:\n${p.take(800)}")
    // plan strings print top-down: the aggregate must sit BELOW (after in
    // text) the first join it feeds
    assert(joinIdx.isDefined && aggIdx.get > joinIdx.get,
      s"per-doc collapse does not feed the joins:\n${p.take(800)}")
  }

  test("q09 projection prunes the parquet read schema to selected columns") {
    val p = plan("q09_part_features")
    val scan = p.linesIterator.find(_.contains("FileScan parquet")).getOrElse("")
    assert(scan.contains("ReadSchema"), p.take(600))
    assert(!scan.contains("p_comment"),
      s"unused column not pruned from the scan:\n${scan.take(600)}")
  }
}
