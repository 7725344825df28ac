package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{TopKBuffer, TopKCollect}
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** The custom mergeable top-k aggregate: buffer algebra properties,
  * value agreement with the window formulation (q82 ≡ q107), and the
  * plan contract the aggregate exists FOR (no Window, partial object
  * hash aggregation). */
class TopKCollectSpec extends SparkSpec {

  private def checkProp(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private def direct(k: Int, xs: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long)] = {
    val b = new TopKBuffer(k)
    xs.foreach(t => b.insert(t._1, t._2, t._3))
    b.heap.toSeq.sorted
  }

  test("buffer: merge of any split equals the direct fold (order-independence)") {
    val entry = for {
      o <- Gen.choose(0L, 50L); i <- Gen.choose(0L, 1000L); p <- Gen.choose(0L, 9L)
    } yield (o, i, p)
    checkProp("merge", Prop.forAll(Gen.listOf(entry), Gen.choose(1, 8), Gen.choose(0.0, 1.0)) {
      (xs, k, cut) =>
        val at = (xs.size * cut).toInt
        val (l, r) = xs.splitAt(at)
        val bl = new TopKBuffer(k); l.foreach(t => bl.insert(t._1, t._2, t._3))
        val br = new TopKBuffer(k); r.foreach(t => br.insert(t._1, t._2, t._3))
        br.heap.foreach(t => bl.insert(t._1, t._2, t._3))
        bl.heap.toSeq.sorted == direct(k, xs)
    })
  }

  test("buffer: deterministic under heavy duplicate (ord, id) keys") {
    // full-tuple order means the kept payloads can never depend on
    // partition/merge order even when (ord, id) collide
    val entry = for {
      o <- Gen.choose(0L, 2L); i <- Gen.choose(0L, 2L); p <- Gen.choose(0L, 9L)
    } yield (o, i, p)
    checkProp("dups", Prop.forAll(Gen.listOf(entry), Gen.choose(1, 4), Gen.choose(0.0, 1.0)) {
      (xs, k, cut) =>
        val at = (xs.size * cut).toInt
        val (l, r) = xs.splitAt(at)
        val bl = new TopKBuffer(k); l.foreach(t => bl.insert(t._1, t._2, t._3))
        val br = new TopKBuffer(k); r.reverse.foreach(t => br.insert(t._1, t._2, t._3))
        br.heap.foreach(t => bl.insert(t._1, t._2, t._3))
        bl.heap.toSeq.sorted == xs.sorted.take(k)
    })
  }

  test("buffer: keeps exactly the k smallest by (ord, id) with ties id-stable") {
    checkProp("smallest", Prop.forAll(Gen.listOf(Gen.choose(0L, 20L)), Gen.choose(1, 6)) {
      (ords, k) =>
        val xs = ords.zipWithIndex.map { case (o, i) => (o, i.toLong, 0L) }
        direct(k, xs) == xs.sorted.take(k)
    })
  }

  test("q107 aggregate cap is row-identical to q82's window cap") {
    val d = sf("sf0.01")
    val agg = SparkEntry.queries("q107_per_source_cap_agg")(spark, d)
    val win = SparkEntry.queries("q82_per_source_cap")(spark, d)
    assert(agg.exceptAll(win).count() == 0 && win.exceptAll(agg).count() == 0)
  }

  test("q107 plans as a partial object-hash aggregate, never a window sort") {
    val df = SparkEntry.queries("q107_per_source_cap_agg")(spark, sf("sf0.01"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Window"), s"aggregate form must not window-sort:\n${p.take(900)}")
    assert(p.contains("ObjectHashAggregate"), p.take(900))
    assert(p.contains("partial_topk_collect"),
      s"map-side partial aggregation is the point of the operator:\n${p.take(900)}")
  }

  test("registered for SQL as topk_collect") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((1L, 10L, 100L), (1L, 5L, 50L), (1L, 7L, 70L)).toDF("g", "id", "pay")
      .createOrReplaceTempView("tk_probe")
    val r = spark.sql(
      "SELECT topk_collect(id, id, pay, 2) AS kept FROM tk_probe GROUP BY g").head()
    val kept = r.getSeq[org.apache.spark.sql.Row](0)
    assert(kept.map(x => (x.getLong(1), x.getLong(2))) == Seq((5L, 50L), (7L, 70L)))
  }

  test("serialization round-trips the buffer across the shuffle boundary") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val zero = Literal(0L)
    val e = new TopKCollect(zero, zero, zero, 3)
    val b = new TopKBuffer(3)
    Seq((5L, 1L, 10L), (1L, 2L, 20L), (3L, 3L, 30L), (2L, 4L, 40L)).foreach(t => b.insert(t._1, t._2, t._3))
    val rt = e.deserialize(e.serialize(b))
    assert(rt.heap.toSeq.sorted == b.heap.toSeq.sorted)
    assert(rt.k == 3)
  }
}
