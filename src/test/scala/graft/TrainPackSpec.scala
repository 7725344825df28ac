package graft

import org.apache.spark.sql.functions._

/** Invariant + plan contracts for the wave-2 training-data pipeline ops
  * (TrainPack q93–q100, DedupPack q96). The DuckDB value gate is the
  * driver's; these specs pin the algebraic invariants the oracle can't
  * see (coverage, recall against an independent recompute, plan shape).
  */
class TrainPackSpec extends SparkSpec {
  import spark.implicits._

  private val d = sf("sf0.001")
  private def run(q: String) = SparkEntry.queries(q)(spark, d)

  test("q93 chunking covers every token exactly: stride·(chunks−1)+last = n_tokens") {
    val chunks = run("q93_doc_chunking")
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        max("chunk_idx").as("max_idx"),
        max(struct(col("chunk_idx"), col("n_chunk_tokens"))).as("last"),
        min("n_chunk_tokens").as("min_len"),
        max("n_chunk_tokens").as("max_len"))
    val toks = graft.io.Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val joined = chunks.join(toks, "doc_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (nChunks, maxIdx) = (r.getAs[Long]("n_chunks"), r.getAs[Long]("max_idx"))
      val lastLen = r.getAs[org.apache.spark.sql.Row]("last").getLong(1)
      val n = r.getAs[Long]("n_tokens")
      assert(maxIdx == nChunks - 1, s"chunk_idx not dense: $r")
      assert(r.getAs[Long]("max_len") <= 40 && r.getAs[Long]("min_len") >= 1)
      // chunks advance by 30; the last one holds the tail tokens
      assert(30 * (nChunks - 1) + lastLen == n || (n <= 40 && nChunks == 1 && lastLen == n),
        s"coverage mismatch: $r")
    }
  }

  test("chunking edge cases: token counts straddling the stride and window boundaries") {
    val cases = Seq(1, 29, 30, 31, 39, 40, 41, 70, 100)
    val docs = cases.zipWithIndex
      .map { case (n, i) => (i.toLong, (1 to n).map(t => s"t$t").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = graft.queries.TrainPack.chunkFrame(docs)
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_idx") === 0, col("n_chunk_tokens"))).as("first_len"),
        max(struct(col("chunk_idx"), col("n_chunk_tokens"))).as("last"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("first_len"),
          r.getAs[org.apache.spark.sql.Row]("last").getLong(1)))).toMap
    cases.zipWithIndex.foreach { case (n, i) =>
      val expChunks = math.ceil(n / 30.0).toLong
      val expFirst = math.min(n, 40).toLong
      val lastStart = 30 * (expChunks - 1) + 1
      val expLast = math.min(n - lastStart + 1, 40).toLong
      assert(got(i.toLong) == ((expChunks, expFirst, expLast)),
        s"n=$n: got ${got(i.toLong)}, expected ${(expChunks, expFirst, expLast)}")
    }
  }

  test("q94 redaction finds exactly the planted PII and scrubs it") {
    val rows = run("q94_pii_redaction").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val expectedEmails = if (id % 4 == 0) 2L else 1L
      assert(r.getAs[Long]("n_emails") == expectedEmails, s"doc $id: $r")
      assert(r.getAs[Long]("n_long_nums") >= 1, s"doc $id lost its account number: $r")
    }
    // scrubbing is idempotent and total: redacting the redacted text is a no-op
    val re = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val probe = Seq("a x9@b.io y 1234567890 z").toDF("t")
      .select(regexp_replace(regexp_replace(col("t"), re, "<EMAIL>"), "[0-9]{9,}", "<NUM>").as("r"))
      .head().getString(0)
    assert(probe == "a <EMAIL> y <NUM> z")
  }

  test("q95 decontamination agrees with an independent exact-set recompute") {
    // independent path: materialize gram SETS per doc and intersect
    // driver-side (sf0.001 is small enough) — same flags, no join logic shared
    val docs = graft.io.Tables.documents(spark, d)
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("source"),
        transform(array_distinct(graft.text.TextOps.wordNgrams(col("w"), 5)),
          graft.text.TextOps.hash32(_)).as("gs"))
      .collect()
    val bench = docs.filter(_.getAs[Long]("doc_id") % 17 == 0)
      .flatMap(r => r.getSeq[Long](r.fieldIndex("gs"))).toSet
    val expected = docs.filter(_.getAs[Long]("doc_id") % 17 != 0)
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rs) =>
        val contaminated = rs.map(r => r.getSeq[Long](r.fieldIndex("gs")).count(bench.contains))
          .filter(_ > 0)
        src -> ((rs.size.toLong, contaminated.size.toLong, contaminated.map(_.toLong).sum))
      }
    val got = run("q95_decontamination").collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_train"), r.getAs[Long]("n_contaminated"), r.getAs[Long]("shared_grams"))))
      .toMap
    assert(got == expected)
  }

  test("q95 broadcasts the benchmark gram set (the corpus side never shuffles for the join)") {
    val df = run("q95_decontamination")
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin"), p.take(800))
  }

  test("q96 canonical selection matches q85's clusters and picks a max-quality member") {
    val q96 = run("q96_canonical_selection")
    val q85 = run("q85_dedup_components")
    val sizes96 = q96.select(col("comp"), col("n_members")).as[(Long, Long)].collect().toMap
    val sizes85 = q85.select(col("comp"), col("n_members")).as[(Long, Long)].collect().toMap
    assert(sizes96 == sizes85, "q96 clusters diverge from q85")
    // canonical doc must carry the cluster's max quality (r6-rounded)
    val bad = q96.filter(col("best_quality").isNull || col("canonical_id").isNull).count()
    assert(bad == 0)
  }

  test("q97 keep flag is exactly the threshold predicate over its own signals") {
    val rows = run("q97_repetition_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_bigram_frac")
      val top = r.getAs[Double]("top_token_frac")
      assert(dup >= 0.0 && dup <= 1.0 && top > 0.0 && top <= 1.0, s"$r")
      assert((r.getAs[Int]("keep") == 1) == (dup <= 0.2 && top <= 0.2), s"$r")
    }
  }

  test("q98 melt emits |values| rows per input row with intact values") {
    val parts = graft.io.Tables.part(spark, d)
    val n = parts.count()
    val melted = run("q98_unpivot_melt")
    assert(melted.count() == 2 * n)
    val sumSize = melted.filter(col("metric") === "p_size").agg(sum("value")).head().getDouble(0)
    val expect = parts.agg(sum(col("p_size").cast("double"))).head().getDouble(0)
    assert(sumSize == expect)
  }

  test("q99 mixture sampling upweights small sources and never exceeds totals") {
    val rows = run("q99_mixture_sampling").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_total"), s"$r")
      assert(r.getAs[Long]("thr") <= 1000000L, s"$r")
    }
    // α=0.5 keep-RATE must be monotonically non-increasing in source size
    val bySize = rows.sortBy(_.getAs[Long]("n_total"))
    val thrs = bySize.map(_.getAs[Long]("thr"))
    assert(thrs.zip(thrs.drop(1)).forall { case (a, b) => a >= b },
      s"keep rate should shrink with source size: ${bySize.mkString(", ")}")
  }

  test("q105 boilerplate spans agree with an independent driver-side recompute") {
    // sf0.01: the corpus genuinely contains df≥5 spans (sf0.001 doesn't)
    val d01 = sf("sf0.01")
    val grams = graft.io.Tables.documents(spark, d01)
      .select(col("doc_id"), explode(graft.text.TextOps.wordNgrams(
        split(col("text"), " "), 3)).as("s"))
      .select(col("doc_id"), graft.text.TextOps.hash32(col("s")).as("g"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val boiler = grams.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size)
      .filter(_._2 >= 5).keySet.toSet
    assert(boiler.nonEmpty, "corpus should contain df>=5 spans at sf0.01")
    val expected = grams.groupBy(_._1).view.mapValues { gs =>
      (gs.size.toLong, gs.count(p => boiler.contains(p._2)).toLong)
    }.toMap
    val got = SparkEntry.queries("q105_boilerplate_spans")(spark, d01).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_boiler")))).toMap
    assert(got == expected)
    assert(expected.values.exists(_._2 > 0))
  }

  test("q106 datasheet percentiles are ordered and cover the corpus") {
    val rows = run("q106_quality_datasheet").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("p10") <= r.getAs[Double]("p50"), s"$r")
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p90"), s"$r")
      assert(r.getAs[Boolean]("within_tol"), s"$r")
    }
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == graft.io.Tables.documents(spark, d).count())
  }

  test("q100 packing bins are consistent and the plan shuffles once (window+agg share the key)") {
    val df = run("q100_sequence_packing")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bins, docs, toks) = (r.getAs[Long]("n_bins"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("total_tokens"))
      assert(bins >= 1 && bins <= docs, s"$r")
      // bins are dense prefix indices: floor((total - last_doc)/256) + 1 ≤ total/256 + 1
      assert(bins <= toks / 256 + 1, s"$r")
      assert(approx(r.getAs[Double]("avg_bin_tokens"),
        math.rint(toks.toDouble / bins * 1e6) / 1e6, 1e-9), s"$r")
    }
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1,
      s"window cumsum and per-source agg should share one source-keyed shuffle, saw $exchanges:\n${p.take(1200)}")
  }
}
