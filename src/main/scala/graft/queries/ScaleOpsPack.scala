package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bloom

import graft.QueryPack
import graft.io.Tables
import graft.relational.{IncrementalAgg, ZOrder}
import graft.text.TextOps
import graft.util.{Parity, Staging}

/** Wave-5 scale-path operators: the ops whose entire reason to exist is
  * the 100 TB regime — incremental view maintenance (don't rescan the
  * base), two-pass heavy hitters (don't shuffle the long tail), corpus
  * LM quality scoring, z-order layout (prune on BOTH filter columns),
  * deterministic negative sampling (map-only generation), a
  * bloom-prefiltered decontamination twin of q95 (membership pruning when
  * the benchmark set outgrows a broadcast hash relation), and the
  * manifest table's full write lifecycle — pruned read (q164), keyed
  * MERGE (q181), compaction (q182), bloom point-skip (q183), range
  * delete (q179), streaming ingest through a crash (q184), version-log
  * time travel (q185), change feeds from merge and delete (q186, q189),
  * 2D file skipping over the z-order layout (q187), and dynamic file
  * pruning through a manifest semi-join (q188).
  *
  * Every query stays oracle-exact: approximate structures (sample
  * candidates, bloom bits) only decide WHERE work happens; an exact
  * confirm pass makes the emitted rows engine-replayable.
  */
object ScaleOpsPack extends QueryPack {

  /** Materialized per-customer order aggregate over the pre-cutoff half of
    * `orders` — the "maintained view" q121 folds a delta into. State
    * columns are order-independent (COUNT + exact-decimal SUM) so the
    * merge is associative at any partitioning. */
  private val Cutoff = "2001-01-01"
  private def stagedView(s: SparkSession, d: String): String =
    Staging.ensure(Staging.dirFor("orders_view", d), s"$d/orders.parquet") { dir =>
      import org.apache.spark.sql.types.DecimalType
      Tables.orders(s, d)
        .filter(col("o_orderdate") < lit(Cutoff).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).as("sum_price"))
        .write.mode("overwrite").parquet(dir)
    }

  /** q164: orders laid out as 16 date-range-sorted files plus their
    * per-file min/max manifest — staged TOGETHER so the manifest can
    * never go stale against a re-staged layout. */
  private def stagedDateLayout(s: SparkSession, d: String): String =
    Staging.ensure(Staging.dirFor("orders_bydate", d), s"$d/orders.parquet") { dir =>
      Tables.orders(s, d)
        .repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/data")
      graft.io.FileSkipping.buildManifest(s, s"$dir/data", "o_orderdate")
        .write.mode("overwrite").parquet(s"$dir/manifest")
    }

  /** q183: lineitem laid out as 32 part-sorted files plus a per-file
    * BLOOM manifest on `l_orderkey` — the column the layout is NOT
    * sorted by, so range stats prune nothing and only the bloom can
    * skip files on a point lookup. Staged together (read-only probe). */
  private def stagedPartLayout(s: SparkSession, d: String): String =
    Staging.ensure(Staging.dirFor("lineitem_bypart", d), s"$d/lineitem.parquet") { dir =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_partkey", "l_extendedprice")
        .repartitionByRange(32, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(s"$dir/data")
      graft.io.FileSkipping.buildBloomManifest(s, s"$dir/data", "l_orderkey", 8192)
        .write.mode("overwrite").parquet(s"$dir/bloom")
    }

  /** q187: lineitem z-ordered on an (x, y) plane derived by the
    * replayable keyHash from two DIFFERENT source columns (so both
    * coordinates cover the full 0..255 range at every scale factor —
    * raw l_suppkey tops out at 100 at sf0.01), as 32 z-sorted files
    * plus a MULTI-column manifest carrying each file's extents in BOTH
    * dims — the layout that lets one table serve file-pruned reads on
    * either filter column (read-only probe, staged once per sfDir). */
  private def stagedZLayout(s: SparkSession, d: String): String =
    Staging.ensure(Staging.dirFor("lineitem_zorder", d), s"$d/lineitem.parquet") { dir =>
      Tables.lineitem(s, d)
        .select(pmod(Parity.keyHash(col("l_orderkey")), lit(256L)).as("x"),
          pmod(Parity.keyHash(col("l_partkey") * 131), lit(256L)).as("y"),
          col("l_extendedprice"))
        .withColumn("z", ZOrder.zValue(col("x"), col("y"), 8))
        .repartitionByRange(32, col("z")).sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite").parquet(s"$dir/data")
      graft.io.FileSkipping.buildManifestMulti(s, s"$dir/data", Seq("x", "y"))
        .write.mode("overwrite").parquet(s"$dir/manifest")
    }

  override def stage(s: SparkSession, d: String): Unit = {
    stagedView(s, d); stagedDateLayout(s, d); stagedPartLayout(s, d)
    stagedZLayout(s, d); ()
  }

  /** Shared MERGE-family fixture (q181/q185/q186/q189/q190): a fresh
    * 16-file key-sorted copy of orders plus its manifest under `base`,
    * staged per RUN — a mutation must be exercised, not replayed.
    * Returns the source projection the deltas derive from. */
  private def stagedOrdersCopy(s: SparkSession, d: String, base: String): DataFrame = {
    graft.util.Staging.deleteRecursive(base)
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    orders.repartitionByRange(16, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.mode("overwrite").parquet(s"$base/data")
    graft.io.FileSkipping.buildManifest(s, s"$base/data", "o_orderkey")
      .write.mode("overwrite").parquet(s"$base/manifest")
    orders
  }

  /** The fixture's delta arithmetic, mirrored VERBATIM by the oracles
    * (one definition here; four oracle SQL twins below — change both):
    * ~1% of keys update (priority → 9-MERGED, price ×2, exact in
    * double); ~0.17% insert at key+10⁸, provably beyond every file's
    * range. */
  private def mergeUpdates(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 97 === 0)
      .withColumn("o_orderpriority", lit("9-MERGED"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)

  private def mergeInserts(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderkey") % 601 === 0)
      .select((col("o_orderkey") + 100000000L).as("o_orderkey"),
        lit("9-MERGED").as("o_orderpriority"),
        (col("o_totalprice") + 5).as("o_totalprice"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── q121: incremental materialized-view maintenance ────────────────
    // The delta (orders since the cutoff) is aggregated and MERGED into
    // the staged view — the base facts are never rescanned, the view is
    // never shuffled (broadcast decomposition, see [[IncrementalAgg]]).
    // Oracle: the full from-scratch aggregate — merge(view, delta) must
    // equal it exactly, including customers that only exist in the delta.
    "q121_incremental_view" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val view = s.read.parquet(stagedView(s, d))
      val delta = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit(Cutoff).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).as("sum_price"))
      IncrementalAgg.merge(view, delta, Seq("o_custkey"))
        .select(col("o_custkey"), col("n_orders"),
          col("sum_price").cast("double").as("sum_price"))
    },

    // ── q122: two-pass exact heavy hitters, CERTIFIED ──────────────────
    // Pass 1 counts tokens on a deterministic 30% doc sample and keeps the
    // top 400 as candidates; pass 2 exact-counts ONLY candidate tokens
    // (broadcast semi prefilter → the long-tail vocabulary never enters
    // the shuffle — at corpus scale that tail IS the aggregation cost).
    // The final top-25 is exact iff candidates ⊇ true top-25; the oracle
    // verifies that at test scale, and at 100 TB the query CERTIFIES it:
    // every non-candidate occurrence streams through a Count-Min sketch,
    // whose min-over-rows max-cell is a HARD upper bound on every tail
    // token's true count (CMS never undercounts — no distributional
    // assumption, unlike the round-6 concentration heuristic this
    // replaces). `sound` = 25th exact count ≥ that bound, a worst-case
    // certificate; a token pathologically concentrated in unsampled docs
    // now provably flips it false (spec-asserted). Collisions can only
    // RAISE the bound — an undersized sketch says "cannot certify",
    // never certifies falsely. See [[graft.text.HeavyHitters]].
    "q122_heavy_hitters" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.text.HeavyHitters.topKCertified(docs, col("text"), col("doc_id"))
    },

    // ── q123: bigram language-model quality score ──────────────────────
    // Corpus-trained add-one-smoothed bigram log-likelihood per document —
    // the model-free cousin of perplexity filtering in LLM data pipelines.
    // The exploded bigram stream collapses to per-(doc, bigram) COUNTS
    // first (round-6 restructure): every later join then carries one row
    // per distinct bigram per doc instead of per occurrence, which is the
    // load-bearing skew mitigation here — a hot stopword bigram ("of the")
    // contributes |docs| rows to the gram-keyed join, not |occurrences|.
    // That matters because AQE skew-split CANNOT rescue these joins: their
    // build sides are same-stage aggregates, one of the two shapes that
    // silently disable OptimizeSkewedJoin (needs fresh shuffle stages on
    // BOTH sides — measured in the round-6 skew sweep, BASELINE.md); if a
    // gram is still hot after the collapse, the explicit salting path
    // (Scale.saltedJoin) is the remedy, not AQE. Scores re-weight by the
    // count IN DECIMAL: lp (≤6 decimals) is cast to decimal(28,6) BEFORE
    // the ×nb — decimal×bigint is exact at any nb, whereas the double
    // product could cross a 0.5e-6 rounding boundary once nb·|lp|·2⁻⁵²
    // exceeds 5e-7 (nb ≈ 9e7 at |lp| ≈ 25) and diverge from the oracle's
    // per-occurrence sum (round-6 review finding).
    // ln() is rounded to 6 decimals the moment it's computed (the
    // transcendental parity rule), so every downstream sum is exact.
    "q123_bigram_lm_score" -> { (s, d) =>
      val ws = Tables.documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
      val nb = ws.select(col("doc_id"),
          explode(TextOps.wordNgrams(col("w"), 2)).as("b"))
        .groupBy("doc_id", "b").agg(count(lit(1)).as("nb"))
      val cb = nb.groupBy("b").agg(sum(col("nb")).as("cb"))
      // context counts and vocabulary DERIVE from the (far smaller) bigram
      // aggregate — Σ cb by first word ≡ counting the exploded stream, so
      // the corpus is exploded once total, not three times
      val cu = cb.groupBy(substring_index(col("b"), " ", 1).as("w1"))
        .agg(sum(col("cb")).as("cu"))
      val vocab = cb.select(substring_index(col("b"), " ", 1).as("w1"))
        .agg(countDistinct(col("w1")).as("v"))
      nb.join(cb, "b")
        .withColumn("w1", substring_index(col("b"), " ", 1))
        .join(cu, "w1")
        .crossJoin(broadcast(vocab))
        .withColumn("lp", round(
          log((col("cb") + lit(1)).cast("double") / (col("cu") + col("v")).cast("double")), 6))
        .groupBy("doc_id")
        // emit the exact-decimal SUM, not the mean: sum-of-rounded is
        // bit-exact cross-engine, but sum/n has unbounded decimals and a
        // final round() can land on a 6-decimal midpoint where Spark and
        // DuckDB tie-break differently (bit sf0.1 doc 1223); callers
        // divide by n_bigrams themselves when they want the mean
        .agg(sum(col("nb")).as("n_bigrams"),
          sum(col("lp").cast(org.apache.spark.sql.types.DecimalType(28, 6)) * col("nb"))
            .cast("double").as("sum_logprob"))
    },

    // ── q158: Count-Min sketch heavy hitters ───────────────────────────
    // The streaming/mergeable cousin of q122's two-pass exact counts:
    // one fixed-size CMS built distributively (map-side partial sketches,
    // driver merge — `DataFrameStatFunctions.countMinSketch`), probed for
    // the exact top-50 keys. The sketch estimate itself is not
    // engine-portable (DuckDB has no CMS), so the ORACLE gates only the
    // STRUCTURAL guarantee: emit the exact count (oracle replays it) plus
    // `ok` = est ≥ exact — CMS counters only increment, so
    // never-underestimate holds on EVERY dataset, and `ok` is uniformly
    // true by construction (the q122 `sound` pattern). The ≤ eps·N
    // overshoot bound is only probabilistic (per-probe failure ~2^-7 at
    // this depth), so it is asserted in ScaleOpsSpec against the current
    // testdata, NOT hash-gated — a driver data regen must not be able to
    // flip a probabilistic coin into a spurious correctness failure.
    // At 100 TB the sketch is the only state that moves: ~eps⁻¹·ln(1/δ)
    // longs, mergeable across partitions/streams, vs q122's candidate
    // shuffle.
    "q158_cms_heavy_hitters" -> { (s, d) =>
      val ev = Tables.events(s, d)
      val cms = ev.stat.countMinSketch("user_id", eps = 0.001, confidence = 0.99, seed = 42)
      val probes = ev.groupBy("user_id").agg(count(lit(1)).as("exact"))
        .orderBy(col("exact").desc, col("user_id").asc).limit(50)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      import s.implicits._
      val out = probes.toSeq.map { case (uid, exact) =>
        val est = cms.estimateCount(java.lang.Long.valueOf(uid))
        (uid, exact, est >= exact)
      }
      out.toDF("user_id", "exact", "ok")
        .orderBy(col("exact").desc, col("user_id").asc)
    },

    // ── q124: z-order (Morton) clustering tiles ────────────────────────
    // Interleave 8 bits of each filter column; the top 6 z-bits define 64
    // tiles, and the per-tile extents PROVE the locality property: every
    // tile spans ≤ 32 of the 256 values in x AND in y, so parquet min/max
    // stats on a z-sorted layout prune reads for predicates on either
    // column. The layout job itself is `repartitionByRange(z).
    // sortWithinPartitions(z).write` — one range shuffle at any scale
    // (file-level extents spec-asserted in ScaleOpsSpec).
    "q124_zorder_tiles" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      li.select(
          ZOrder.zValue(col("l_partkey"), col("l_suppkey"), 8).as("z"),
          pmod(col("l_partkey"), lit(256L)).as("x"),
          pmod(col("l_suppkey"), lit(256L)).as("y"))
        .groupBy(shiftright(col("z"), 10).as("tile"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("min_x"), max(col("x")).as("max_x"),
          min(col("y")).as("min_y"), max(col("y")).as("max_y"))
    },

    // ── q125: deterministic negative sampling ──────────────────────────
    // K=8 candidate negatives per supplier from a portable hash formula —
    // generation is a pure projection (sequence + explode, NO shuffle, no
    // RNG state), then one hash join against the true-positive pairs flags
    // collisions. At 100 TB the positives shuffle once on the composite
    // key; candidates are tiny and co-partition for free.
    "q125_negative_sampling" -> { (s, d) =>
      val nparts = Tables.part(s, d).agg(count(lit(1)).as("np"))
      val cand = Tables.supplier(s, d).select(col("s_suppkey"))
        .crossJoin(broadcast(nparts))
        .select(col("s_suppkey"), col("np"),
          explode(sequence(lit(1L), lit(8L))).as("k"))
        .select(col("s_suppkey"), col("k"),
          pmod(Parity.keyHash(col("s_suppkey") * lit(131) + col("k")), col("np"))
            .as("neg_partkey"))
      val pos = Tables.lineitem(s, d).select(col("l_suppkey"), col("l_partkey")).distinct()
      cand.join(pos,
          cand("s_suppkey") === pos("l_suppkey") && cand("neg_partkey") === pos("l_partkey"),
          "left")
        .select(col("s_suppkey"), col("k"), col("neg_partkey"),
          col("l_partkey").isNotNull.as("collided"))
    },

    // ── q126: bloom-prefiltered decontamination (q95's 100 TB twin) ────
    // Same semantics as q95, different membership transport: the benchmark
    // shingle set is compressed to a ~10-bits/element bloom (vs ≥64 for
    // the raw hash set), probed map-side by a codegen'd expression, and
    // the few survivors are confirmed with the exact broadcast join — so
    // the result is bit-identical to q95's exact answer (bloom false
    // positives die in the confirm join; false negatives are impossible).
    // ScaleOpsSpec asserts the prefilter actually prunes.
    "q126_bloom_decontam" -> { (s, d) =>
      import s.implicits._
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("w"))
      val grams = base.select(col("doc_id"), col("source"),
          explode(array_distinct(TextOps.wordNgrams(col("w"), 5))).as("sgl"))
        .select(col("doc_id"), col("source"), TextOps.hash32(col("sgl")).as("g"))
      // The benchmark gram set stays DISTRIBUTED end-to-end: persisted
      // once, counted (sizes the bit array), then OR-merged into the bloom
      // via per-partition partial blooms (treeAggregate) — driver memory is
      // O(bloom bits), ~6× smaller than the raw 8-byte hash set the bloom
      // exists to avoid shipping. Released by the session's cache
      // discipline (Verify/Bench clear per query/run).
      val bench = grams.filter(pmod(col("doc_id"), lit(17)) === 0)
        .select(col("g")).distinct().persist()
      val bloom = Bloom.buildDistributed(bench.as[Long].rdd, bench.count())
      // Deliberately NO broadcast hint on the confirm join: at the
      // benchmark sizes the bloom exists for, the exact set does NOT fit a
      // broadcast hash relation — the scalable confirm is a shuffle join
      // of the (tiny, bloom-surviving) stream against the distributed
      // benchmark grams, and AQE picks broadcast on its own when the set
      // happens to be small (as here)
      val flagged = grams.filter(pmod(col("doc_id"), lit(17)) =!= 0)
        .filter(Bloom.probe(bloom)(col("g")))
        .join(bench, "g")
        .groupBy("doc_id", "source").agg(count(lit(1)).as("n_shared"))
      val totals = base.filter(pmod(col("doc_id"), lit(17)) =!= 0)
        .groupBy("source").agg(count(lit(1)).as("n_train"))
      totals.join(
          flagged.groupBy("source").agg(
            count(lit(1)).as("n_contaminated"), sum("n_shared").as("shared_grams")),
          Seq("source"), "left")
        .select(col("source"), col("n_train"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
          coalesce(col("shared_grams"), lit(0L)).as("shared_grams"))
    },

    // ── q164: manifest-driven FILE-level data skipping ────────────────
    // The table-format pattern without the table format: a per-file
    // min/max manifest (staged with the layout) decides which files a
    // 2-month date probe OPENS — row-group skip prunes inside a file;
    // this prunes the file open itself. The residual filter keeps the
    // answer exact, so the oracle is the plain filtered aggregate over
    // the source table; ScaleOpsSpec measures the file-open reduction.
    "q164_manifest_pruned_read" -> { (s, d) =>
      val base = stagedDateLayout(s, d)
      val lo = lit("1998-03-01").cast("timestamp")
      val hi = lit("1998-04-30").cast("timestamp")
      graft.io.FileSkipping.prunedRead(s, s"$base/data", s"$base/manifest", lo, hi)
        .filter(col("o_orderdate") >= lo && col("o_orderdate") <= hi)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q179: FILE-LEVEL range delete through the manifest ────────────
    // The manifest corner of the round-8 delete ask ("nothing removes …
    // the file-skipping manifest"): drop a whole year from a date-sorted
    // table. FileSkipping.deleteRange retires fully-covered files
    // WITHOUT READING THEM (pure manifest range math — how a table
    // format drops files), rewrites only the boundary files minus the
    // range, and folds the manifest rows accordingly — cost
    // O(boundary files), not O(table). The query mutates its OWN fresh
    // copy each run (a delete must be exercised, not replayed from a
    // marker) and reads the survivor table back: the deleted year must
    // be gone and every other year intact to the penny.
    "q179_manifest_range_delete" -> { (s, d) =>
      import graft.io.FileSkipping
      val base = "/root/repo/target/scratch/q179_del"
      graft.util.Staging.deleteRecursive(base)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      orders.repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifest(s, s"$base/data", "o_orderdate")
        .write.mode("overwrite").parquet(s"$base/manifest")
      FileSkipping.deleteRange(s, s"$base/data", s"$base/manifest", "o_orderdate",
        lit("1995-01-01").cast("timestamp"), lit("1995-12-31").cast("timestamp"))
      s.read.parquet(s"$base/data")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q181: keyed MERGE (upsert) costed by the manifest ─────────────
    // The Delta-`MERGE INTO` shape without the table format, completing
    // the manifest table's write lifecycle (q164 append, q179 delete,
    // q182 compact): a small keyed delta of updates + brand-new keys is
    // merged into a 16-file key-sorted table — the manifest's range math
    // picks the files that can contain a delta key, ONLY those are read
    // and rewritten (survivor rows + replacements, re-range-sorted), the
    // inserts land beyond every file's range, the manifest folds. The
    // query mutates its OWN fresh copy each run (a merge must be
    // exercised, not replayed) and reads the merged table back; the
    // oracle recomputes the merge set-theoretically over the source.
    "q181_manifest_merge" -> { (s, d) =>
      val base = "/root/repo/target/scratch/q181_merge"
      val orders = stagedOrdersCopy(s, d, base)
      graft.io.FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest",
        "o_orderkey", mergeUpdates(orders).unionByName(mergeInserts(orders)))
      s.read.parquet(s"$base/data")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q182: small-file compaction with manifest fold ────────────────
    // The daily maintenance job of a streaming-ingested table: 48
    // micro-batch-sized files re-clustered through one range exchange
    // into a handful of keyspace-disjoint, range-sorted files; files at
    // or above the size threshold are never read or moved. The oracle is
    // the plain source aggregate — compaction must be a pure layout
    // change, every row preserved exactly once to the penny; the file
    // COUNT drop and untouched-big-file bytes are ScaleOpsSpec's side.
    "q182_manifest_compaction" -> { (s, d) =>
      import graft.io.FileSkipping
      val base = "/root/repo/target/scratch/q182_compact"
      graft.util.Staging.deleteRecursive(base)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      orders.repartitionByRange(48, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifest(s, s"$base/data", "o_orderdate")
        .write.mode("overwrite").parquet(s"$base/manifest")
      FileSkipping.compactSmall(s, s"$base/data", s"$base/manifest", "o_orderdate",
        smallBytes = 512 * 1024, targetBytes = 1024 * 1024)
      s.read.parquet(s"$base/data")
        .groupBy(year(col("o_orderdate")).cast("long").as("y"))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q183: bloom-manifest POINT-lookup file skipping ───────────────
    // The needle-in-haystack read range stats cannot serve: the layout
    // is part-sorted, so every file's l_orderkey [min,max] spans the
    // whole domain — yet an order's ~4 line items live in only a few
    // files. The per-file bloom (no false negatives) admits just those;
    // the residual isin keeps the answer exact, so false positives only
    // cost a file open. The bloom probe itself runs executor-side over
    // the manifest. ScaleOpsSpec measures the file-open reduction.
    "q183_bloom_point_read" -> { (s, d) =>
      val base = stagedPartLayout(s, d)
      val probe = Array(11L, 4177L, 9973L)
      graft.io.FileSkipping.bloomPointRead(s, s"$base/data", s"$base/bloom", probe)
        .filter(col("l_orderkey").isin(probe.map(Long.box).toIndexedSeq: _*))
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("l_extendedprice")).as("sum_price"))
    },

    // ── q184: streaming ingest INTO the manifest table, through a crash ─
    // The 100 TB ingestion path end-to-end: the staged 3-file event
    // replay drains through foreachBatch into per-batch data+manifest
    // slots (FileSkipping.ingestBatch) with a simulated crash mid-batch-1
    // — the at-least-once replay must land exactly-once because each
    // batch owns its slots — then the manifest folds flat
    // (finalizeIngest), the micro-batch files compact through one range
    // exchange, and the result is a PRUNED read of the first week.
    // The oracle is the plain source aggregate over the same window: any
    // duplicated or lost row from the crash, the manifest handoff, or
    // compaction shows up to the penny.
    "q184_stream_ingest_table" -> { (s, d) =>
      import graft.io.FileSkipping
      import graft.streaming.Streams
      val base = "/root/repo/target/scratch/q184_ingest"
      graft.util.Staging.deleteRecursive(base)
      val src = Streams.prepareLateArrivalFiles(s, d)
      Streams.drainWithCrashRecoveryInto(
        () => Streams.lateArrivalStream(s, src), "q184_ingest", "append", 1) {
        (b, id) => FileSkipping.ingestBatch(b, id, s"$base/data", s"$base/manifest", "ts")
      }
      FileSkipping.finalizeIngest(s, s"$base/manifest")
      FileSkipping.compactSmall(s, s"$base/data", s"$base/manifest", "ts",
        smallBytes = 64L * 1024 * 1024, targetBytes = 8L * 1024 * 1024)
      val ev = Tables.events(s, d)
      val t0 = ev.agg(date_trunc("DAY", min(col("ts")))).head().getTimestamp(0)
      val t1 = new java.sql.Timestamp(t0.getTime + 7L * 86400 * 1000)
      FileSkipping.prunedRead(s, s"$base/data", s"$base/manifest", lit(t0), lit(t1))
        .filter(col("ts") >= lit(t0) && col("ts") < lit(t1))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("sum_value"))
    },

    // ── q185: version log — snapshot isolation / time travel ──────────
    // The reader guarantee every mutation's scaladoc deferred to "a real
    // table format": mutations in versioned mode snapshot the manifest
    // (|files| rows) and stop deleting retired files, so a reader pinned
    // to v0 replays the ORIGINAL table bit-for-bit after a MERGE and a
    // range delete have both retired its files from the head. The query
    // returns v0 and head aggregates side by side; the oracle recomputes
    // both set-theoretically — time travel must be exact, not best-effort.
    "q185_version_travel" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q185_versions"
      val orders = stagedOrdersCopy(s, d, base)
      val vlog = Some(s"$base/versions")
      VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest", "o_orderkey",
        mergeUpdates(orders), versionLog = vlog) // v1
      FileSkipping.deleteRange(s, s"$base/data", s"$base/manifest", "o_orderkey",
        lit(1L), lit(3000L), versionLog = vlog) // v2
      def agg(df: org.apache.spark.sql.DataFrame, snap: String) =
        df.groupBy(lit(snap).as("snap"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
      agg(VersionLog.readVersion(s, s"$base/versions", 0), "v0")
        .unionByName(agg(VersionLog.readVersion(s, s"$base/versions",
          VersionLog.head(s, s"$base/versions")), "head"))
    },

    // ── q186: MERGE change-data feed (CDC) ────────────────────────────
    // The Delta-CDF shape: the merge emits its own change rows
    // (update_preimage / update_postimage / insert) in one extra pass
    // over (touched ∪ delta) — the feed an incremental view maintainer
    // or replica consumes instead of diffing table snapshots at
    // O(table). The oracle recomputes all three row classes from the
    // source with the same key arithmetic.
    "q186_merge_cdc_feed" -> { (s, d) =>
      val base = "/root/repo/target/scratch/q186_cdc"
      val orders = stagedOrdersCopy(s, d, base)
      graft.io.FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest",
        "o_orderkey", mergeUpdates(orders).unionByName(mergeInserts(orders)),
        cdcDir = Some(s"$base/cdc"))
      s.read.parquet(s"$base/cdc")
        .groupBy("op")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q187: multi-column manifest × z-order — 2D FILE skipping ──────
    // q124/q134 proved z-order's row-group pruning; this is the same
    // property one level up, where 100 TB actually hurts: the manifest
    // carries every file's extents in BOTH interleaved dims, so a 2D box
    // (1/64 of the plane) opens a handful of the 32 files, and a probe
    // on EITHER single column still prunes — one layout, two pruned
    // access paths (ScaleOpsSpec measures both, plus the x-sorted
    // contrast layout that cannot prune y). The residual filter keeps
    // the answer oracle-exact.
    "q187_zorder_multidim_skip" -> { (s, d) =>
      val base = stagedZLayout(s, d)
      graft.io.FileSkipping.prunedReadMulti(s, s"$base/data", s"$base/manifest",
          Seq(("x", lit(64L), lit(95L)), ("y", lit(160L), lit(191L))))
        .filter(col("x").between(64L, 95L) && col("y").between(160L, 191L))
        .agg(count(lit(1)).as("n"), Parity.dsum(col("l_extendedprice")).as("sum_price"))
    },

    // ── q188: DYNAMIC FILE PRUNING (manifest semi-join read) ──────────
    // The read side of the MERGE's range probe, and the manifest-level
    // analog of Spark's dynamic partition pruning for range-CLUSTERED
    // (not partitioned-by-value) tables: a tiny driving dimension — a
    // deterministic ~1/601 sample of distinct order dates — decides
    // which fact files are opened at all via a broadcast range
    // semi-join against the manifest; the residual broadcast join keeps
    // the answer exact. At 100 TB this is "scan the week's files, not
    // the table". ScaleOpsSpec measures the file-open bound (≤ one file
    // per driving date on the range-sorted layout).
    "q188_dynamic_file_pruning" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val base = stagedDateLayout(s, d)
      val dates = Tables.orders(s, d).select(col("o_orderdate")).distinct()
        .withColumn("rn", row_number().over(Window.orderBy(col("o_orderdate"))))
        .filter(pmod(col("rn"), lit(601)) === 1)
        .select(col("o_orderdate"))
      graft.io.FileSkipping.semiJoinRead(s, s"$base/data", s"$base/manifest", dates)
        .join(broadcast(dates), Seq("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q189: range-delete CDC feed — the delete half of the CDF ──────
    // q186 emits the merge's change classes; this completes the feed
    // with `delete` pre-images from the range delete. The trade is
    // explicit and paid knowingly: covered files are normally retired
    // UNREAD (q179's whole point), but a change feed must read the
    // victims once — O(deleted rows), the price Delta pays to write CDF
    // files on DELETE. The oracle recomputes the deleted set from the
    // source; the spec proves survivors ∪ feed == source exactly once.
    "q189_delete_cdc_feed" -> { (s, d) =>
      val base = "/root/repo/target/scratch/q189_delcdc"
      stagedOrdersCopy(s, d, base)
      graft.io.FileSkipping.deleteRange(s, s"$base/data", s"$base/manifest",
        "o_orderkey", lit(1000L), lit(4000L), cdcDir = Some(s"$base/cdc"))
      s.read.parquet(s"$base/cdc")
        .groupBy("op", "o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q190: incremental view maintenance FROM the change feed ───────
    // The reason change feeds exist: a downstream aggregate stays
    // current by consuming the merge's CDC rows with signed weights
    // (pre-image −1, post-image/insert +1) — the base table is NEVER
    // rescanned after the view is first built (plan-spec-pinned: the
    // maintenance reads only view + feed). Decimal sums make the
    // arithmetic exact, so the maintained view equals a full rebuild of
    // the merged table bit-for-bit — which is exactly what the oracle
    // computes. Completes the q121 story: there the delta was re-read
    // from the base; here it arrives as the mutation's own feed.
    "q190_cdc_view_maintenance" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val base = "/root/repo/target/scratch/q190_cdcview"
      val orders = stagedOrdersCopy(s, d, base)
      // the maintained view, built once BEFORE the merge
      orders.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).as("sum_dec"))
        .write.mode("overwrite").parquet(s"$base/view")
      graft.io.FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest",
        "o_orderkey", mergeUpdates(orders).unionByName(mergeInserts(orders)),
        cdcDir = Some(s"$base/cdc"))
      // maintenance: ONLY the staged view + the feed
      val delta = s.read.parquet(s"$base/cdc")
        .withColumn("w",
          when(col("op") === "update_preimage", lit(-1L)).otherwise(lit(1L)))
        .groupBy("o_orderpriority")
        .agg(sum(col("w")).as("dn"),
          sum(col("o_totalprice").cast(DecimalType(28, 4)) * col("w")).as("dsum_dec"))
      s.read.parquet(s"$base/view")
        .join(delta, Seq("o_orderpriority"), "full_outer")
        .select(col("o_orderpriority"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
          (coalesce(col("sum_dec").cast(DecimalType(38, 8)), lit(0).cast(DecimalType(38, 8))) +
            coalesce(col("dsum_dec").cast(DecimalType(38, 8)), lit(0).cast(DecimalType(38, 8))))
            .cast("double").as("sum_price"))
        .filter(col("n") > 0)
    },

    // ── q192: MULTI-WRITER OCC — two concurrent merges, rebase commit ──
    // The version log's documented boundary ("true multi-writer needs
    // content-level conflict re-validation") closed: two transactions
    // BOTH pin the v0 snapshot, compute their merges against it into
    // private txn slots, and commit optimistically — writer A lands as
    // v1; writer B's commit finds a head it did not read, validates that
    // v1 neither removed B's files nor wrote into B's key band (the
    // deltas update disjoint thirds of the keyspace, so the 16-file
    // range-sorted layout gives them disjoint write footprints), and
    // REBASES onto v1 as v2. head_version = 2 proves the rebase path ran
    // — a serialized second writer would also reach v2, but
    // ConcurrencySpec races genuinely concurrent threads through
    // mergeKeyedOcc and pins the band-conflict abort (claim released,
    // retry converges), the file-conflict abort, the claim spin-wait,
    // the orphaned-claim timeout, and the disjoint-writers-both-land
    // union directly. The oracle applies both band-disjoint updates to
    // the source — under OCC that equals ANY commit order.
    "q192_occ_concurrent_merge" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q192_occ"
      val orders = stagedOrdersCopy(s, d, base)
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val kmax = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val (lo3, hi3) = (kmax / 3, 2L * (kmax / 3))
      val deltaA = orders.filter(col("o_orderkey") <= lo3 && col("o_orderkey") % 97 === 0)
        .withColumn("o_orderpriority", lit("9-OCC-A"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val deltaB = orders.filter(col("o_orderkey") >= hi3 && col("o_orderkey") % 89 === 0)
        .withColumn("o_orderpriority", lit("9-OCC-B"))
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      // both transactions pin v0 BEFORE either commits — B's snapshot is
      // stale by the time it commits, which is the path under test
      val pinA = VersionLog.begin(s, vdir)
      val pinB = VersionLog.begin(s, vdir)
      FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        deltaA, "A", pinned = Some(pinA)) // v1
      val vB = FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        deltaB, "B", pinned = Some(pinB)) // v2, via rebase
      VersionLog.syncLive(s, vdir, s"$base/manifest")
      VersionLog.readVersion(s, vdir, vB)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"),
          min(lit(vB.toLong)).as("head_version"))
    },

    // ── q193: rewrite-only OCC — compaction racing a MERGE, both land ──
    // The canonical production conflict pair (round-9 verdict #3): the
    // daily compactor races a live MERGE writer. The compaction's key
    // band spans the table by construction, so plain band validation
    // would abort it on EVERY overlap — but it changes no content.
    // commitRebase's commit classification (Delta's WriteSerializable
    // refinement) lets it commit `rewriteOnly`: band checks are skipped
    // in both directions, file conflicts still abort (ConcurrencySpec
    // pins the abort + both orders). Here: a 1-big + 12-small-file
    // layout; a MERGE pinned at v0 updates keys inside the big file and
    // inserts beyond every range (its band spans the smalls'), lands as
    // v1; the compaction — ALSO pinned at v0, file-disjoint — rebases
    // over it as v2. head_version = 2 proves the rewrite-only rebase
    // path ran; the oracle recomputes the merge set-theoretically —
    // compaction must be invisible to the penny.
    "q193_occ_compaction_merge" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q193_occ_compact"
      graft.util.Staging.deleteRecursive(base)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
      val split = orders.agg(max(col("o_orderkey"))).head().getLong(0) / 2
      orders.filter(col("o_orderkey") <= split).coalesce(1)
        .write.mode("overwrite").parquet(s"$base/data")
      orders.filter(col("o_orderkey") > split)
        .repartitionByRange(12, col("o_orderkey")).sortWithinPartitions("o_orderkey")
        .write.mode("append").parquet(s"$base/data")
      FileSkipping.buildManifest(s, s"$base/data", "o_orderkey")
        .write.mode("overwrite").parquet(s"$base/manifest")
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val delta = orders
        .filter(col("o_orderkey") <= split && col("o_orderkey") % 97 === 0)
        .withColumn("o_orderpriority", lit("9-OCC-M"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
        .unionByName(mergeInserts(orders))
      val pinM = VersionLog.begin(s, vdir)
      val pinC = VersionLog.begin(s, vdir)
      FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        delta, "M", pinned = Some(pinM)) // v1
      val dp = new org.apache.hadoop.fs.Path(s"$base/data")
      val fs = dp.getFileSystem(s.sessionState.newHadoopConf())
      val bigLen = fs.listStatus(dp)
        .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).max
      val (vC, _, _) = FileSkipping.compactSmallOcc(s, s"$base/data", vdir,
        "o_orderkey", smallBytes = bigLen, targetBytes = Long.MaxValue,
        "C", pinned = Some(pinC)) // v2, rewrite-only rebase over the merge
      VersionLog.syncLive(s, vdir, s"$base/manifest")
      VersionLog.readVersion(s, vdir, vC)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"),
          min(lit(vC.toLong)).as("head_version"))
    },

    // ── q194: VERSIONED streaming ingest — time travel across an active
    // ingest (round-9 verdict #7). q184 proved exactly-once slot ingest
    // but required a quiesced handoff before any reader guarantee; here
    // every micro-batch commits one log version (head ∪ slot stats) with
    // a _BATCH_<id> idempotence token, so a reader pinned after batch 0
    // replays EXACTLY batch 0 even though two more batches (and a
    // mid-batch-1 crash + replay, which the token short-circuits without
    // a duplicate version) land after it. The query returns the pinned
    // b0 aggregate beside the head aggregate; the oracle recomputes both
    // from the source — the pinned snapshot is file 1's rows by the
    // staged replay's construction (pre-cutoff, event_id % 10 != 0),
    // the head is everything.
    "q194_versioned_stream_ingest" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      import graft.streaming.Streams
      val base = "/root/repo/target/scratch/q194_vingest"
      graft.util.Staging.deleteRecursive(base)
      val src = Streams.prepareLateArrivalFiles(s, d)
      val vdir = s"$base/versions"
      Streams.drainWithCrashRecoveryInto(
        () => Streams.lateArrivalStream(s, src), "q194_vingest", "append", 1) {
        (b, id) => FileSkipping.ingestBatchVersioned(b, id, s"$base/data", "ts", vdir); ()
      }
      val head = VersionLog.head(s, vdir)
      require(head == 2, s"3 batches must commit exactly 3 versions, head=$head")
      def agg(df: org.apache.spark.sql.DataFrame, snap: String) =
        df.groupBy(lit(snap).as("snap"), col("event_type"))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("sum_value"))
      agg(VersionLog.readVersion(s, vdir, 0), "b0")
        .unionByName(agg(VersionLog.readVersion(s, vdir, head), "head"))
    },

    // ── q198: OCC range delete — two band-disjoint deletes, rebase ────
    // Completes the OCC mutator family (merge q192, compaction q193):
    // both transactions pin v0, delete disjoint key ranges (their
    // write footprints — retired-file bands — are disjoint on the
    // 16-file range-sorted layout), writer A lands as v1, writer B
    // REBASES onto v1 as v2. ConcurrencySpec pins the genuinely-racing
    // version of this plus the same-band delete-vs-merge abort; the
    // oracle removes both ranges from the source — under OCC that
    // equals any commit order.
    "q198_occ_range_delete" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q198_occdel"
      val orders = stagedOrdersCopy(s, d, base)
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val kmax = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val pinA = VersionLog.begin(s, vdir)
      val pinB = VersionLog.begin(s, vdir)
      FileSkipping.deleteRangeOcc(s, s"$base/data", vdir, "o_orderkey",
        lit(kmax / 10), lit(2 * (kmax / 10)), "A", pinned = Some(pinA)) // v1
      val (vB, _, _) = FileSkipping.deleteRangeOcc(s, s"$base/data", vdir, "o_orderkey",
        lit(7 * (kmax / 10)), lit(8 * (kmax / 10)), "B", pinned = Some(pinB)) // v2
      VersionLog.syncLive(s, vdir, s"$base/manifest")
      VersionLog.readVersion(s, vdir, vB)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"),
          min(lit(vB.toLong)).as("head_version"))
    },

    // ── q199: STREAMING CDC view maintenance, crash-idempotent ────────
    // q190 consumed the change feed as a batch; this is how a live
    // replica actually consumes it — `readStream` over the feed
    // directory, each micro-batch folded into the maintained view with
    // signed weights and exact-decimal sums. Two sequential MERGEs emit
    // the feed (the second overwrites some of the first's rows —
    // replacement semantics, so the oracle's CASE arithmetic is
    // order-free); the per-batch folds are additive and commutative, so
    // ANY micro-batch split converges to the same view, which must equal
    // a full rebuild of the twice-merged table to the penny. The base
    // table is never rescanned after the view is built.
    //
    // Crash idempotence (round-10 verdict #2 — the original kept the
    // view-version counter in driver memory and ignored foreachBatch's
    // batchId, so a crash-replayed batch folded into the wrong view):
    // view slots are keyed BY BATCH ID — batch b reads view_b(b-1) (or
    // the seed) and OVERWRITES view_b(b), so a replay of b re-derives
    // the same slot from inputs the crash could not have touched:
    // exactly-once by construction, the engine's q184/q194 bar. Proven
    // live: the stream is driven through drainWithCrashRecoveryInto with
    // a mid-stream crash at batch 1 (the harness asserts the crash fired
    // and the batch was re-fed), and the oracle is still hash-exact.
    "q199_stream_cdc_view" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      val base = "/root/repo/target/scratch/q199_streamcdc"
      val orders = stagedOrdersCopy(s, d, base)
      orders.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).as("sum_dec"))
        .write.mode("overwrite").parquet(s"$base/view_seed")
      graft.io.FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest",
        "o_orderkey", mergeUpdates(orders).unionByName(mergeInserts(orders)),
        cdcDir = Some(s"$base/cdc"))
      graft.io.FileSkipping.mergeKeyed(s, s"$base/data", s"$base/manifest",
        "o_orderkey", orders.filter(col("o_orderkey") % 89 === 0)
          .withColumn("o_orderpriority", lit("8-M2"))
          .withColumn("o_totalprice", col("o_totalprice") * 3),
        cdcDir = Some(s"$base/cdc"))
      // 1 file per trigger: each merge's feed is now ONE coalesced file
      // (the O(|delta|) feed write pays one file-commit, not ~32 — see
      // mergeKeyed's coalesce note), so the two merges give exactly two
      // micro-batches — still a multi-batch fold (convergence is the
      // property under test, and the crash harness needs a batch 1 to
      // crash in) without the old ~64 fixed per-batch job costs
      val schema = s.read.parquet(s"$base/cdc").schema
      @volatile var lastBatch = -1L
      graft.streaming.Streams.drainWithCrashRecoveryInto(
        () => s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(s"$base/cdc"),
        "q199_streamcdc", "append", crashAtBatch = 1) { (b, id) =>
          val delta = b
            .withColumn("w",
              when(col("op") === "update_preimage", lit(-1L)).otherwise(lit(1L)))
            .groupBy("o_orderpriority")
            .agg(sum(col("w")).as("dn"),
              sum(col("o_totalprice").cast(DecimalType(28, 4)) * col("w")).as("dsum_dec"))
          val prev = if (id == 0) s"$base/view_seed" else s"$base/view_b${id - 1}"
          s.read.parquet(prev)
            .join(delta, Seq("o_orderpriority"), "full_outer")
            .select(col("o_orderpriority"),
              (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
              (coalesce(col("sum_dec").cast(DecimalType(38, 8)),
                  lit(0).cast(DecimalType(38, 8))) +
                coalesce(col("dsum_dec").cast(DecimalType(38, 8)),
                  lit(0).cast(DecimalType(38, 8))))
                .cast(DecimalType(28, 4)).as("sum_dec"))
            .write.mode("overwrite").parquet(s"$base/view_b$id")
          lastBatch = math.max(lastBatch, id)
        }
      s.read.parquet(s"$base/view_b$lastBatch")
        .filter(col("n") > 0)
        .select(col("o_orderpriority"), col("n"),
          col("sum_dec").cast("double").as("sum_price"))
    },

    // ── q195–q197: SQL-STRING frontend for the table ops (round-9
    // verdict #5 stretch). q58 proved the QUERY frontend; these route
    // the MUTATIONS and time travel through MERGE INTO / DELETE WHERE /
    // VACUUM / VERSION AS OF strings (graft.io.TableSql) — each
    // statement maps 1:1 onto the FileSkipping/VersionLog call its
    // Scala twin (q181/q179/q185) makes, and each oracle is the twin's
    // oracle, so the SQL path must be observationally identical.

    // q195: q181's MERGE through a MERGE INTO string; the read-back also
    // goes through the SQL frontend (manifest-decided head view).
    "q195_sql_merge" -> { (s, d) =>
      import graft.io.TableSql
      val base = "/root/repo/target/scratch/q195_sqlmerge"
      val orders = stagedOrdersCopy(s, d, base)
      val reg = Map("otable" -> TableSql.TableRef(
        s"$base/data", s"$base/manifest", "o_orderkey"))
      mergeUpdates(orders).unionByName(mergeInserts(orders))
        .createOrReplaceTempView("q195_delta")
      TableSql(s, reg,
        """MERGE INTO otable USING q195_delta
           ON otable.o_orderkey = q195_delta.o_orderkey
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect()
      TableSql(s, reg,
        s"""SELECT o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM otable GROUP BY o_orderpriority""")
    },

    // q196: q179's range delete through a DELETE string — in VERSIONED
    // mode, then VACUUM RETAIN 1 VERSIONS through its string (the
    // physical delete), then the survivor read through the head view.
    "q196_sql_delete_vacuum" -> { (s, d) =>
      import graft.io.TableSql
      val base = "/root/repo/target/scratch/q196_sqldel"
      graft.util.Staging.deleteRecursive(base)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      orders.repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$base/data")
      graft.io.FileSkipping.buildManifest(s, s"$base/data", "o_orderdate")
        .write.mode("overwrite").parquet(s"$base/manifest")
      graft.io.VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("dtable" -> TableSql.TableRef(
        s"$base/data", s"$base/manifest", "o_orderdate",
        versionsDir = Some(s"$base/versions")))
      TableSql(s, reg,
        """DELETE FROM dtable WHERE o_orderdate
           BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'""").collect()
      TableSql(s, reg, "VACUUM dtable RETAIN 1 VERSIONS").collect()
      TableSql(s, reg,
        s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM dtable GROUP BY year(o_orderdate)""")
    },

    // q197: q185's snapshot isolation through the SQL surface — a
    // MERGE INTO and a DELETE (both versioned), then ONE statement reads
    // `VERSION AS OF 0` beside the head and must see the original table
    // bit-exactly on the v0 side.
    "q197_sql_time_travel" -> { (s, d) =>
      import graft.io.TableSql
      val base = "/root/repo/target/scratch/q197_sqltravel"
      val orders = stagedOrdersCopy(s, d, base)
      graft.io.VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("ttable" -> TableSql.TableRef(
        s"$base/data", s"$base/manifest", "o_orderkey",
        versionsDir = Some(s"$base/versions")))
      mergeUpdates(orders).createOrReplaceTempView("q197_delta")
      TableSql(s, reg,
        """MERGE INTO ttable USING q197_delta
           ON ttable.o_orderkey = q197_delta.o_orderkey
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").collect() // v1
      TableSql(s, reg,
        "DELETE FROM ttable WHERE o_orderkey BETWEEN 1 AND 3000").collect() // v2
      TableSql(s, reg,
        s"""SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM ttable VERSION AS OF 0 GROUP BY o_orderpriority
            UNION ALL
            SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM ttable GROUP BY o_orderpriority""")
    },

    // ── q200/q201: the SQL frontend's OCC path (round-10 verdict #6:
    // "a versioned table's SQL users cannot reach multi-writer
    // semantics"). Same statements as q195/q196, tables registered
    // `occ = true`: each statement is ONE OCC transaction — fresh pin,
    // private txn slot, rebase commit, CDC slot tied to the commit's
    // fate — and SELECTs bind the LOG head (under OCC the log is truth,
    // the flat manifest a cache). Oracles are the Scala twins' oracles
    // plus the committed version the metrics frame returned, so the
    // result proves BOTH observational identity and that the
    // transactional path (v0 bootstrap + one commit = v1) actually ran.

    "q200_sql_occ_merge" -> { (s, d) =>
      import graft.io.{TableSql, VersionLog}
      val base = "/root/repo/target/scratch/q200_sqloccmerge"
      val orders = stagedOrdersCopy(s, d, base)
      VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("omtable" -> TableSql.TableRef(
        s"$base/data", s"$base/manifest", "o_orderkey",
        versionsDir = Some(s"$base/versions"), cdcDir = Some(s"$base/cdc"),
        occ = true))
      mergeUpdates(orders).unionByName(mergeInserts(orders))
        .createOrReplaceTempView("q200_delta")
      val v = TableSql(s, reg,
        """MERGE INTO omtable USING q200_delta
           ON omtable.o_orderkey = q200_delta.o_orderkey
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""").head().getLong(0)
      TableSql(s, reg,
        s"""SELECT o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM omtable GROUP BY o_orderpriority""")
        .withColumn("head_version", lit(v))
    },

    // q201: OCC DELETE through its string, then VACUUM RETAIN 1 (drops
    // v0 and physically reclaims the files only it referenced), then the
    // survivor read through the log-head binding.
    "q201_sql_occ_delete" -> { (s, d) =>
      import graft.io.TableSql
      val base = "/root/repo/target/scratch/q201_sqloccdel"
      graft.util.Staging.deleteRecursive(base)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_orderdate", "o_totalprice")
      orders.repartitionByRange(16, col("o_orderdate"))
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite").parquet(s"$base/data")
      graft.io.FileSkipping.buildManifest(s, s"$base/data", "o_orderdate")
        .write.mode("overwrite").parquet(s"$base/manifest")
      graft.io.VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("odtable" -> TableSql.TableRef(
        s"$base/data", s"$base/manifest", "o_orderdate",
        versionsDir = Some(s"$base/versions"), occ = true))
      val v = TableSql(s, reg,
        """DELETE FROM odtable WHERE o_orderdate
           BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1995-12-31'""")
        .head().getLong(0)
      TableSql(s, reg, "VACUUM odtable RETAIN 1 VERSIONS").collect()
      TableSql(s, reg,
        s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM odtable GROUP BY year(o_orderdate)""")
        .withColumn("head_version", lit(v))
    },

    // ── q202: 2D manifest THROUGH OCC mutation + time travel (round-10
    // stretch: "carry the multi-stats columns through the snapshot
    // schema"). The table is z-ordered on hash-derived (x, y) and keyed
    // by zk = zvalue·2³³ + o_orderkey (injective, z-clustered); its
    // snapshots carry min/max for x AND y beside the key stats
    // (buildManifestStats bootstrap, statCols on the merge), so after an
    // OCC merge BOTH the pinned v0 and the new head serve 2D box-pruned
    // reads from their own snapshot's stats — no derived cache to go
    // stale (the q187 layout, composed with q192's transaction and
    // q185's time travel). Pruning is superset + residual filter, so the
    // oracle recomputes both boxes set-theoretically; the spec asserts
    // the probe actually opened a strict subset of the snapshot's files.
    "q202_occ_2d_travel" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q202_occ2d"
      graft.util.Staging.deleteRecursive(base)
      val src = Tables.orders(s, d).select(
        col("o_orderkey"),
        pmod(Parity.keyHash(col("o_orderkey")), lit(256L)).as("x"),
        pmod(Parity.keyHash(col("o_custkey") * 131), lit(256L)).as("y"),
        col("o_totalprice"))
      def withZk(df: DataFrame) = df.select(
        (ZOrder.zValue(col("x"), col("y"), 8) * lit(1L << 33) + col("o_orderkey")).as("zk"),
        col("x"), col("y"), col("o_totalprice"))
      withZk(src)
        .repartitionByRange(16, col("zk")).sortWithinPartitions("zk")
        .write.mode("overwrite").parquet(s"$base/data")
      val vdir = s"$base/versions"
      VersionLog.commitSnapshot(s, vdir,
        FileSkipping.buildManifestStats(s, s"$base/data", "zk", Seq("x", "y"))) // v0
      val delta = withZk(src.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2))
      val v1 = FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "zk", delta,
        "Q202", statCols = Seq("x", "y"))
      def box(v: Int, snap: String) =
        FileSkipping.prunedReadVersionMulti(s, vdir, v,
          Seq(("x", lit(64L), lit(95L)), ("y", lit(160L), lit(191L))))
          .filter(col("x").between(64, 95) && col("y").between(160, 191))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
          .select(lit(snap).as("snap"), col("n"), col("sum_price"))
      box(0, "v0").unionByName(box(v1, "head"))
    },

    // ── q203: committed-feed REPLAY as the downstream consumer ────────
    // The round-11 CDC lifecycle end-to-end through the oracle gate: two
    // band-disjoint OCC merges (both pinned at v0, writer B rebases)
    // emit their feeds into per-txn slots; the downstream consumer reads
    // them via readCommittedFeeds (the marker-gated API — aborted and
    // crashed-writer slots invisible by construction) and reconstructs
    // the head WITHOUT ever reading the head: base + postimages −
    // preimages. The aggregate of the rebuilt table must equal the
    // merged table recomputed set-theoretically — any feed slot leaked
    // from an abort, double-written by a retry, or dropped by the
    // marker gate would break the multiset arithmetic to the penny.
    "q203_occ_feed_replay" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q203_occfeed"
      val orders = stagedOrdersCopy(s, d, base)
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val kmax = orders.agg(max(col("o_orderkey"))).head().getLong(0)
      val (lo3, hi3) = (kmax / 3, 2L * (kmax / 3))
      val deltaA = orders.filter(col("o_orderkey") <= lo3 && col("o_orderkey") % 97 === 0)
        .withColumn("o_orderpriority", lit("9-F-A"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val deltaB = orders.filter(col("o_orderkey") >= hi3 && col("o_orderkey") % 89 === 0)
        .withColumn("o_orderpriority", lit("9-F-B"))
        .withColumn("o_totalprice", col("o_totalprice") * 3)
      val pinA = VersionLog.begin(s, vdir)
      val pinB = VersionLog.begin(s, vdir) // stale by commit time — rebases
      FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        deltaA, "FA", pinned = Some(pinA), cdcDir = Some(s"$base/cdc"))
      FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        deltaB, "FB", pinned = Some(pinB), cdcDir = Some(s"$base/cdc"))
      val feed = FileSkipping.readCommittedFeeds(s, s"$base/cdc")
      VersionLog.readVersion(s, vdir, 0)
        .unionByName(feed.filter(col("op") =!= "update_preimage").drop("op"))
        .exceptAll(feed.filter(col("op") === "update_preimage").drop("op"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
    },

    // ── q204: DATA-schema evolution through the version log ───────────
    // Round-11 verdict #1: a MERGE delta that ADDS a column commits with
    // `evolveSchema = true` — the evolved schema rides the snapshot dir,
    // the head read null-fills the new column for every pre-evolution
    // file (no mergeSchema footer scans: the log carries the schema),
    // and a reader pinned at v0 still sees the ORIGINAL schema. The
    // bonus column is price/2 (a binary-exact halving, so the oracle's
    // double arithmetic replays bit-for-bit). Both snapshots' aggregates
    // are recomputed set-theoretically by the oracle; the v0 side's
    // sum_bonus is the literal 0 the pinned (pre-evolution) schema
    // forces. SchemaEvolutionSpec pins the loud default-rejection half
    // of the contract and the record's propagation through compaction.
    "q204_occ_schema_evolution" -> { (s, d) =>
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q204_schevo"
      val orders = stagedOrdersCopy(s, d, base)
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val delta = mergeUpdates(orders)
        .withColumn("o_bonus", col("o_totalprice") / 2)
      val v1 = FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
        delta, "EVO", evolveSchema = true)
      val head = VersionLog.readVersion(s, vdir, v1)
      val v0 = VersionLog.readVersion(s, vdir, 0)
      // self-check the pin's schema (the spec asserts it too; a leak here
      // would also hash-mismatch the oracle's 0-bonus column)
      require(!v0.columns.contains("o_bonus"),
        "pre-evolution pinned version leaked the evolved column")
      head.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"),
          Parity.dsum(coalesce(col("o_bonus"), lit(0.0))).as("sum_bonus"))
        .select(lit("head").as("snap"), col("o_orderpriority"), col("n"),
          col("sum_price"), col("sum_bonus"))
        .unionByName(v0.groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"),
            Parity.dsum(lit(0.0)).as("sum_bonus"))
          .select(lit("v0").as("snap"), col("o_orderpriority"), col("n"),
            col("sum_price"), col("sum_bonus")))
    },

    // ── q205: INCREMENTAL committed-feed consumption + slot retention ──
    // Round-11 verdict #2 + #4 end-to-end: three OCC merges emit feed
    // slots; the downstream view folds them through a VERSION CURSOR
    // (readCommittedFeedsSince) instead of re-reading history — the
    // consumption after merge 3 provably opens only slot 3, because the
    // consumed slots are PHYSICALLY RECLAIMED (vacuumFeeds) before it
    // runs and the fold still converges. A crash-shaped replay of round
    // 1 (same cursor, same slots, overwrite of the same view slot) runs
    // between the rounds — exactly-once by cursor-keyed idempotence, the
    // q199 batchId shape. The maintained view must equal a full rebuild
    // of the thrice-merged table to the penny; the base is aggregated
    // ONCE (the seed) and never rescanned.
    "q205_occ_feed_incremental" -> { (s, d) =>
      import org.apache.spark.sql.types.DecimalType
      import graft.io.{FileSkipping, VersionLog}
      val base = "/root/repo/target/scratch/q205_feedinc"
      val orders = stagedOrdersCopy(s, d, base)
      val vdir = s"$base/versions"
      val cdc = s"$base/cdc"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      orders.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(28, 4))).as("sum_dec"))
        .write.mode("overwrite").parquet(s"$base/view_v0")
      def merge(tag: String, mod: Int, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Int =
        FileSkipping.mergeKeyedOcc(s, s"$base/data", vdir, "o_orderkey",
          orders.filter(col("o_orderkey") % mod === 0)
            .withColumn("o_orderpriority", lit(tag))
            .withColumn("o_totalprice", f(col("o_totalprice"))),
          tag, pinned = Some(VersionLog.begin(s, vdir)), cdcDir = Some(cdc))
      def fold(feed: DataFrame, fromCursor: Int, toCursor: Int): Unit = {
        val delta = feed
          .withColumn("w",
            when(col("op") === "update_preimage", lit(-1L)).otherwise(lit(1L)))
          .groupBy("o_orderpriority")
          .agg(sum(col("w")).as("dn"),
            sum(col("o_totalprice").cast(DecimalType(28, 4)) * col("w")).as("dsum_dec"))
        s.read.parquet(s"$base/view_v$fromCursor")
          .join(delta, Seq("o_orderpriority"), "full_outer")
          .select(col("o_orderpriority"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
            (coalesce(col("sum_dec").cast(DecimalType(38, 8)),
                lit(0).cast(DecimalType(38, 8))) +
              coalesce(col("dsum_dec").cast(DecimalType(38, 8)),
                lit(0).cast(DecimalType(38, 8))))
              .cast(DecimalType(28, 4)).as("sum_dec"))
          .write.mode("overwrite").parquet(s"$base/view_v$toCursor")
      }
      merge("9-I-A", 97, _ * 2) // v1
      merge("9-I-B", 89, _ * 3) // v2
      val (Some(f12), c12) = FileSkipping.readCommittedFeedsSince(s, cdc, 0): @unchecked
      fold(f12, 0, c12)
      // crash-shaped replay of round 1: same cursor -> same slots -> the
      // SAME view slot overwritten — the fold must be idempotent
      val (Some(f12b), c12b) = FileSkipping.readCommittedFeedsSince(s, cdc, 0): @unchecked
      require(c12b == c12, s"cursor drifted across a replayed poll: $c12b != $c12")
      fold(f12b, 0, c12)
      // consumed slots physically reclaimed; round 2 can only read slot 3
      require(FileSkipping.vacuumFeeds(s, cdc, consumedThrough = c12,
          versionsDir = Some(vdir)) == 2,
        "expected both consumed feed slots reclaimed")
      merge("9-I-C", 101, _ + 7) // v3
      val (Some(f3), c3) = FileSkipping.readCommittedFeedsSince(s, cdc, c12): @unchecked
      fold(f3, c12, c3)
      s.read.parquet(s"$base/view_v$c3")
        .filter(col("n") > 0)
        .select(col("o_orderpriority"), col("n"),
          col("sum_dec").cast("double").as("sum_price"))
    },

    // ── q206: INSERT INTO through the SQL frontend ─────────────────────
    // Round-11 verdict #6: the most common mutation a user types reaches
    // appendWithManifest (plain) / appendOcc (OCC transaction) through
    // its string; the SELECT half binds registered tables like any other
    // statement, the column sets are schema-checked by NAME before
    // anything lands (TableSqlSpec pins the mismatch guard), and the OCC
    // side's committed version rides the result. Oracle = base ∪
    // inserted rows, identical on both sides.
    "q206_sql_insert" -> { (s, d) =>
      import graft.io.{TableSql, VersionLog}
      val basep = "/root/repo/target/scratch/q206_insp"
      val baseo = "/root/repo/target/scratch/q206_inso"
      val orders = stagedOrdersCopy(s, d, basep)
      stagedOrdersCopy(s, d, baseo)
      VersionLog.commit(s, s"$baseo/versions", s"$baseo/manifest") // v0
      val reg = Map(
        "ptable" -> TableSql.TableRef(s"$basep/data", s"$basep/manifest", "o_orderkey"),
        "oitable" -> TableSql.TableRef(s"$baseo/data", s"$baseo/manifest", "o_orderkey",
          versionsDir = Some(s"$baseo/versions"), occ = true))
      mergeInserts(orders).createOrReplaceTempView("q206_rows")
      TableSql(s, reg,
        """INSERT INTO ptable
           SELECT o_orderkey, o_orderpriority, o_totalprice FROM q206_rows""").collect()
      val v = TableSql(s, reg,
        """INSERT INTO oitable
           SELECT o_orderkey, o_orderpriority, o_totalprice FROM q206_rows""")
        .head().getLong(0)
      def agg(side: String, table: String) = TableSql(s, reg,
        s"""SELECT '$side' AS side, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM $table GROUP BY o_orderpriority""")
      agg("plain", "ptable").unionByName(agg("occ", "oitable"))
        .withColumn("occ_version", lit(v))
    },

    // ── q207: OCC-composed STREAMING ingest racing compaction ──────────
    // Round-11 stretch: ingestBatchVersioned's serial-single-writer
    // contract replaced by the OCC rebase path, so the canonical
    // production pair — a LIVE ingest stream + the nightly compactor —
    // composes on one table. Each micro-batch commits a rebase (removed
    // = ∅: it can never file-conflict, and the compactor's commits are
    // rewrite-only, so neither aborts the other); exactly-once across
    // the mid-batch-1 crash is the _BATCH token probed only back to the
    // previous batch's token (never O(history)). The compactor pins
    // BEFORE batch 1 commits and lands AFTER it — a real stale-pin
    // rebase in the middle of the stream. Oracle = the plain source
    // aggregate over everything the 3-file replay delivers; any row
    // duplicated by the crash replay, lost by compaction, or
    // double-committed by the rebase shows up to the penny.
    // ConcurrencySpec races the genuinely-threaded version.
    "q207_occ_stream_ingest" -> { (s, d) =>
      import org.apache.spark.sql.types._
      import graft.io.{FileSkipping, VersionLog}
      import graft.streaming.Streams
      val base = "/root/repo/target/scratch/q207_occingest"
      graft.util.Staging.deleteRecursive(base)
      val src = Streams.prepareLateArrivalFiles(s, d)
      val vdir = s"$base/versions"
      // bootstrap an EMPTY table: v0 is a zero-row stats manifest (the
      // schema record is not needed — the first batch's files define it)
      VersionLog.commitSnapshot(s, vdir, s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("file", StringType), StructField("min_key", TimestampType),
          StructField("max_key", TimestampType), StructField("n_rows", LongType),
          StructField("n_keys", LongType)))))
      @volatile var compacted = false
      Streams.drainWithCrashRecoveryInto(
        () => Streams.lateArrivalStream(s, src), "q207_occingest", "append", 1) {
        (b, id) =>
          // pin BEFORE this batch's commit, compact after it: the
          // compactor's snapshot is stale by one ingest commit and must
          // rebase over it (rewrite-only, so no band abort despite the
          // table-spanning band). The flag keeps the crash REPLAY of
          // batch 1 from compacting twice — the replayed INGEST is the
          // recovery path under test, idempotent via its _BATCH token.
          val pin = if (id == 1 && !compacted) Some(VersionLog.begin(s, vdir)) else None
          // 4 range-clustered files per batch slot: the compactor's bin
          // plan needs >= 2 smalls to have anything to do, and range
          // clustering keeps the stats sharp — the shape a real ingest
          // would pick anyway
          FileSkipping.ingestBatchOcc(b.repartitionByRange(4, col("ts"))
            .sortWithinPartitions("ts"), id, s"$base/data", "ts", vdir)
          pin.foreach { p =>
            compacted = true
            FileSkipping.compactSmallOcc(s, s"$base/data", vdir, "ts",
              smallBytes = 64L * 1024 * 1024, targetBytes = 8L * 1024 * 1024,
              "CPT", pinned = Some(p))
          }
      }
      val head = VersionLog.head(s, vdir)
      require(head == 4, s"3 ingest commits + 1 compaction after v0, head=$head")
      VersionLog.readVersion(s, vdir, head)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Parity.dsum(col("value")).as("sum_value"))
    },

    // ── q208: explicit DDL evolution — ALTER TABLE … ADD COLUMN ────────
    // Round-12 verdict stretch: operators evolve a table WITHOUT a data
    // mutation. The ALTER commits a SCHEMA-ONLY version (file set
    // unchanged, evolved schema recorded — removed = ∅, added = ∅, so it
    // can never conflict with a concurrent writer); an old-shape INSERT
    // then null-fills the new column, a new-shape INSERT carries it, and
    // a reader pinned BEFORE the ALTER keeps the original schema. Every
    // statement goes through the SQL frontend. The oracle recomputes both
    // snapshots set-theoretically; the bonus is price/4 (binary-exact
    // quartering) so the double arithmetic replays bit-for-bit.
    "q208_sql_alter_add_column" -> { (s, d) =>
      import graft.io.{TableSql, VersionLog}
      val base = "/root/repo/target/scratch/q208_alter"
      val orders = stagedOrdersCopy(s, d, base)
      VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("atable" -> TableSql.TableRef(s"$base/data", s"$base/manifest",
        "o_orderkey", versionsDir = Some(s"$base/versions"), occ = true,
        evolveSchema = true))
      TableSql(s, reg, "ALTER TABLE atable ADD COLUMN o_bonus DOUBLE") // v1
      // old-shape INSERT: the added column null-fills
      mergeInserts(orders).createOrReplaceTempView("q208_old_rows")
      TableSql(s, reg,
        """INSERT INTO atable
           SELECT o_orderkey, o_orderpriority, o_totalprice FROM q208_old_rows""") // v2
      // new-shape INSERT: carries the added column
      orders.filter(col("o_orderkey") % 997 === 0)
        .select((col("o_orderkey") + 200000000L).as("o_orderkey"),
          lit("9-BONUS").as("o_orderpriority"),
          col("o_totalprice"),
          (col("o_totalprice") / 4).as("o_bonus"))
        .createOrReplaceTempView("q208_new_rows")
      TableSql(s, reg,
        """INSERT INTO atable
           SELECT o_orderkey, o_orderpriority, o_totalprice, o_bonus
           FROM q208_new_rows""") // v3
      // self-check the pin's schema (a leak would also hash-mismatch the
      // oracle's literal-0 bonus columns)
      require(!VersionLog.readVersion(s, s"$base/versions", 0)
        .columns.contains("o_bonus"),
        "pre-ALTER pinned version leaked the added column")
      val head = TableSql(s, reg,
        s"""SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price,
                   COUNT(o_bonus) AS n_bonus,
                   ${Sql.dsum("COALESCE(o_bonus, 0)")} AS sum_bonus
            FROM atable GROUP BY o_orderpriority""")
      val v0 = TableSql(s, reg,
        s"""SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price,
                   CAST(0 AS BIGINT) AS n_bonus, ${Sql.dsum("0")} AS sum_bonus
            FROM atable VERSION AS OF 0 GROUP BY o_orderpriority""")
      head.unionByName(v0)
    },

    // ── q209: OPTIMIZE + DESCRIBE HISTORY through the SQL frontend ─────
    // The daily maintenance verb a lake operator actually types: OPTIMIZE
    // folds the 16 small staged files through one range exchange as a
    // REWRITE-ONLY OCC transaction (composes with live writers — band
    // checks skipped both directions, q207's production pair), DESCRIBE
    // HISTORY shows the commit classes, and content is provably
    // byte-preserved: the head aggregate AND the pre-OPTIMIZE pinned
    // aggregate must both equal the plain source oracle.
    "q209_sql_optimize" -> { (s, d) =>
      import graft.io.{TableSql, VersionLog}
      val base = "/root/repo/target/scratch/q209_optimize"
      stagedOrdersCopy(s, d, base)
      VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("octable" -> TableSql.TableRef(s"$base/data", s"$base/manifest",
        "o_orderkey", versionsDir = Some(s"$base/versions"), occ = true))
      val m = TableSql(s, reg, "OPTIMIZE octable").head() // v1, rewrite-only
      require(m.getLong(1) >= 2 && m.getLong(2) < m.getLong(1),
        s"OPTIMIZE must fold small files: compacted=${m.getLong(1)} written=${m.getLong(2)}")
      val hist = TableSql(s, reg, "DESCRIBE HISTORY octable").collect()
      require(hist.length == 2 &&
        !hist(0).getBoolean(hist(0).fieldIndex("rewrite_only")) &&
        hist(1).getBoolean(hist(1).fieldIndex("rewrite_only")),
        s"history must show v0 content + v1 rewrite-only, got ${hist.mkString(";")}")
      def agg(snap: String, src: String) = TableSql(s, reg,
        s"""SELECT '$snap' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM $src GROUP BY o_orderpriority""")
      agg("head", "octable").unionByName(agg("v0", "octable VERSION AS OF 0"))
    },

    // ── q210: RESTORE TABLE … TO VERSION AS OF through the SQL frontend ─
    // Delta's rollback verb (round-13 verdict stretch): an INSERT lands
    // (v1), a bad DELETE fires (v2), RESTORE rolls head back to v1 as a
    // NEW commit (v3) — history preserved, so the bad v2 stays
    // inspectable under time travel while head equals the pinned v1
    // EXACTLY. The oracle recomputes all three snapshots
    // set-theoretically; a restore that resurrected the wrong file set,
    // leaked the deleted range, or clobbered history hash-mismatches.
    "q210_sql_restore" -> { (s, d) =>
      import graft.io.{TableSql, VersionLog}
      val base = "/root/repo/target/scratch/q210_restore"
      val orders = stagedOrdersCopy(s, d, base)
      VersionLog.commit(s, s"$base/versions", s"$base/manifest") // v0
      val reg = Map("rtable" -> TableSql.TableRef(s"$base/data", s"$base/manifest",
        "o_orderkey", versionsDir = Some(s"$base/versions"), occ = true))
      mergeInserts(orders).createOrReplaceTempView("q210_ins")
      TableSql(s, reg, "INSERT INTO rtable SELECT * FROM q210_ins") // v1 good
      TableSql(s, reg,
        "DELETE FROM rtable WHERE o_orderkey BETWEEN 100 AND 50000") // v2 bad
      val r = TableSql(s, reg, "RESTORE TABLE rtable TO VERSION AS OF 1").head() // v3
      require(r.getLong(0) == 3 && r.getLong(1) == 1,
        s"restore committed (${r.getLong(0)}, restored_to=${r.getLong(1)}), expected (3, 1)")
      val hist = TableSql(s, reg, "DESCRIBE HISTORY rtable").collect()
      require(hist.length == 4 && hist.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3),
        s"RESTORE must preserve history as a new commit, got ${hist.mkString(";")}")
      require(hist(3).getLong(1) == hist(1).getLong(1),
        s"restored head file count ${hist(3).getLong(1)} != v1's ${hist(1).getLong(1)}")
      def agg(snap: String, src: String) = TableSql(s, reg,
        s"""SELECT '$snap' AS snap, o_orderpriority, COUNT(*) AS n,
                   ${Sql.dsum("o_totalprice")} AS sum_price
            FROM $src GROUP BY o_orderpriority""")
      agg("head", "rtable")
        .unionByName(agg("v1", "rtable VERSION AS OF 1"))
        .unionByName(agg("v2", "rtable VERSION AS OF 2"))
    },

    // ── q211: OPTIMIZE … ZORDER BY through the SQL frontend ────────────
    // Delta's multi-dimensional clustering verb on an EXISTING table:
    // the fixture stages the q202 point cloud SCATTERED (hash-random
    // placement — every file spans the full (x, y) plane, so the 2D
    // manifest admits ALL files for any box), then one SQL ZORDER
    // rewrite re-clusters it as a rewrite-only OCC transaction. The
    // probe asserts the PHYSICAL claim (the same box probe opens
    // strictly fewer files at the z-ordered head than at the scattered
    // v0 — input_file_name()-counted) and the oracle gates the LOGICAL
    // one: both layouts' box aggregates, plus the full-table rollup at
    // the head, replay set-theoretically — a rewrite that lost/duped a
    // row or mis-bucketed the dims hash-mismatches.
    "q211_sql_zorder" -> { (s, d) =>
      import graft.io.{FileSkipping, TableSql, VersionLog}
      val base = "/root/repo/target/scratch/q211_zorder"
      graft.util.Staging.deleteRecursive(base)
      val pts = Tables.orders(s, d).select(
        col("o_orderkey"),
        pmod(Parity.keyHash(col("o_orderkey")), lit(256L)).as("x"),
        pmod(Parity.keyHash(col("o_custkey") * 131), lit(256L)).as("y"),
        col("o_totalprice"))
      pts.repartition(16) // SCATTERED: every file spans the whole plane
        .write.mode("overwrite").parquet(s"$base/data")
      FileSkipping.buildManifestStats(s, s"$base/data", "o_orderkey", Seq("x", "y"))
        .write.mode("overwrite").parquet(s"$base/manifest")
      val vdir = s"$base/versions"
      VersionLog.commit(s, vdir, s"$base/manifest") // v0
      val reg = Map("ztable" -> TableSql.TableRef(s"$base/data", s"$base/manifest",
        "o_orderkey", versionsDir = Some(s"$base/versions"), occ = true))
      val m = TableSql(s, reg, "OPTIMIZE ztable ZORDER BY (x, y)").head() // v1
      require(m.getLong(0) == 1 && m.getLong(1) == 16,
        s"expected v1 rewriting 16 files, got ${m}")
      def boxFiles(v: Int) = FileSkipping.prunedReadVersionMulti(s, vdir, v,
          Seq(("x", lit(64L), lit(95L)), ("y", lit(160L), lit(191L))))
        .select(input_file_name()).distinct().count()
      val (pre, post) = (boxFiles(0), boxFiles(1))
      require(post < pre,
        s"ZORDER did not sharpen 2D pruning: $post files admitted post vs $pre pre")
      // rewrite-only class recorded (composes with live writers)
      val hist = TableSql(s, reg, "DESCRIBE HISTORY ztable").collect()
      require(hist.length == 2 && hist(1).getBoolean(3),
        s"ZORDER commit must be rewrite-only, got ${hist.mkString(";")}")
      def box(v: Int, snap: String) =
        FileSkipping.prunedReadVersionMulti(s, vdir, v,
          Seq(("x", lit(64L), lit(95L)), ("y", lit(160L), lit(191L))))
          .filter(col("x").between(64, 95) && col("y").between(160, 191))
          .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
          .select(lit(snap).as("snap"), col("n"), col("sum_price"))
      box(0, "v0").unionByName(box(1, "head"))
        .unionByName(VersionLog.readVersion(s, vdir, 1)
          .agg(count(lit(1)).as("n"), Parity.dsum(col("o_totalprice")).as("sum_price"))
          .select(lit("head_all").as("snap"), col("n"), col("sum_price")))
    }
  )

  override def oracles: Map[String, String] = Map(

    "q164_manifest_pruned_read" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-03-01'
            AND o_orderdate <= TIMESTAMP '1998-04-30'
          GROUP BY 1""",

    // q179: the survivor table must equal orders minus the deleted range
    // exactly — same inclusive predicate the engine's deleteRange applied
    "q179_manifest_range_delete" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders
          WHERE NOT (o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o_orderdate <= TIMESTAMP '1995-12-31')
          GROUP BY 1""",

    // q181: the merged table recomputed set-theoretically — unmatched
    // base rows ∪ updated rows ∪ inserted rows, same key arithmetic
    "q181_manifest_merge" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                    '9-MERGED' AS o_orderpriority,
                    o_totalprice + 5 AS o_totalprice
                  FROM orders WHERE o_orderkey % 601 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up
                     UNION ALL SELECT * FROM ins)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM merged GROUP BY 1""",

    // q182: compaction is a pure layout change — the table must equal
    // the source exactly, every row preserved once
    "q182_manifest_compaction" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1""",

    // q183: bloom skipping must be invisible to the answer — the plain
    // point-lookup aggregate over the source table
    "q183_bloom_point_read" ->
      s"""SELECT l_orderkey, COUNT(*) AS n,
                 ${Sql.dsum("l_extendedprice")} AS sum_price
          FROM lineitem WHERE l_orderkey IN (11, 4177, 9973)
          GROUP BY 1""",

    // q184: crash + replay + manifest handoff + compaction must be
    // invisible — the plain first-week aggregate over the source
    "q184_stream_ingest_table" ->
      s"""WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS t FROM events),
          b AS (SELECT date_trunc('day', MIN(t)) AS t0,
                       date_trunc('day', MIN(t)) + INTERVAL 7 DAY AS t1 FROM e)
          SELECT event_type, COUNT(*) AS n, ${Sql.dsum("value")} AS sum_value
          FROM e, b WHERE t >= b.t0 AND t < b.t1
          GROUP BY 1""",

    // q185: v0 = the untouched source; head = merge then range delete,
    // recomputed set-theoretically
    "q185_version_travel" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up),
          headt AS (SELECT * FROM merged
                    WHERE o_orderkey NOT BETWEEN 1 AND 3000)
          SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1, 2
          UNION ALL
          SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM headt GROUP BY 1, 2""",

    // q186: the three change classes recomputed from the source — pre
    // images at original values, post images doubled, inserts shifted
    "q186_merge_cdc_feed" ->
      s"""WITH cdc AS (
            SELECT 'update_preimage' AS op, o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT 'update_postimage' AS op, o_totalprice * 2 AS o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
            UNION ALL
            SELECT 'insert' AS op, o_totalprice + 5 AS o_totalprice
            FROM orders WHERE o_orderkey % 601 = 0)
          SELECT op, COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM cdc GROUP BY 1""",

    // q187: 2D file skipping must be invisible — the plain box aggregate
    // over the same keyHash-derived coordinates
    "q187_zorder_multidim_skip" ->
      s"""SELECT COUNT(*) AS n, ${Sql.dsum("l_extendedprice")} AS sum_price
          FROM lineitem
          WHERE (${Sql.keyHash("l_orderkey")} % 256) BETWEEN 64 AND 95
            AND (${Sql.keyHash("(l_partkey * 131)")} % 256) BETWEEN 160 AND 191""",

    // q188: file pruning must be invisible — the plain dimension join
    // with the same deterministic date sample
    "q188_dynamic_file_pruning" ->
      s"""WITH dd AS (SELECT o_orderdate FROM (
                SELECT o_orderdate, ROW_NUMBER() OVER (ORDER BY o_orderdate) AS rn
                FROM (SELECT DISTINCT o_orderdate FROM orders))
              WHERE rn % 601 = 1)
          SELECT o_orderpriority, COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders JOIN dd USING (o_orderdate)
          GROUP BY 1""",

    // q189: the delete feed recomputed from the source range
    "q189_delete_cdc_feed" ->
      s"""SELECT 'delete' AS op, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders WHERE o_orderkey BETWEEN 1000 AND 4000
          GROUP BY 1, 2""",

    // q190: the maintained view must equal a FULL REBUILD of the merged
    // table — recomputed set-theoretically, same arithmetic as q181
    "q190_cdc_view_maintenance" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                    '9-MERGED' AS o_orderpriority,
                    o_totalprice + 5 AS o_totalprice
                  FROM orders WHERE o_orderkey % 601 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up
                     UNION ALL SELECT * FROM ins)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM merged GROUP BY 1""",

    // q192: both band-disjoint OCC merges applied to the source — under
    // snapshot-pinned rebase that equals any commit order; head_version
    // = 2 (v0 bootstrap + two transactional commits) proves B rebased
    "q192_occ_concurrent_merge" ->
      s"""WITH k AS (SELECT MAX(o_orderkey) // 3 AS lo3,
                            2 * (MAX(o_orderkey) // 3) AS hi3 FROM orders),
          m AS (SELECT CASE
                    WHEN o_orderkey <= k.lo3 AND o_orderkey % 97 = 0 THEN '9-OCC-A'
                    WHEN o_orderkey >= k.hi3 AND o_orderkey % 89 = 0 THEN '9-OCC-B'
                    ELSE o_orderpriority END AS o_orderpriority,
                  CASE
                    WHEN o_orderkey <= k.lo3 AND o_orderkey % 97 = 0 THEN o_totalprice * 2
                    WHEN o_orderkey >= k.hi3 AND o_orderkey % 89 = 0 THEN o_totalprice * 3
                    ELSE o_totalprice END AS o_totalprice
                FROM orders, k)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(2 AS BIGINT) AS head_version
          FROM m GROUP BY 1""",

    // q193: the merge recomputed set-theoretically (updates confined to
    // the low half + shifted inserts); the racing rewrite-only compaction
    // must be INVISIBLE — head_version = 2 proves it rebased over v1
    "q193_occ_compaction_merge" ->
      s"""WITH k AS (SELECT MAX(o_orderkey) // 2 AS split FROM orders),
          up AS (SELECT o_orderkey, '9-OCC-M' AS o_orderpriority,
                   o_totalprice * 2 AS o_totalprice
                 FROM orders, k WHERE o_orderkey <= k.split AND o_orderkey % 97 = 0),
          ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                    '9-MERGED' AS o_orderpriority,
                    o_totalprice + 5 AS o_totalprice
                  FROM orders WHERE o_orderkey % 601 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders, k
                   WHERE NOT (o_orderkey <= k.split AND o_orderkey % 97 = 0)),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up
                     UNION ALL SELECT * FROM ins)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(2 AS BIGINT) AS head_version
          FROM merged GROUP BY 1""",

    // q194: the pinned b0 snapshot == staged file 1 (pre-cutoff rows with
    // event_id % 10 != 0 — the late-arrival replay's construction); the
    // head == all events. Crash/replay and later batches must be
    // invisible to the pinned reader.
    "q194_versioned_stream_ingest" ->
      s"""WITH e AS (SELECT event_id, event_type, value,
                       CAST(ts AS TIMESTAMP) AS t FROM events),
          b AS (SELECT date_trunc('day', MIN(t)) + INTERVAL 7 DAY AS t1,
                       date_trunc('day', MIN(t)) + INTERVAL 14 DAY AS t2 FROM e)
          SELECT 'b0' AS snap, event_type, COUNT(*) AS n,
                 ${Sql.dsum("value")} AS sum_value
          FROM e, b WHERE t < b.t1 AND event_id % 10 <> 0
          GROUP BY 1, 2
          UNION ALL
          SELECT 'head' AS snap, event_type, COUNT(*) AS n,
                 ${Sql.dsum("value")} AS sum_value
          FROM e, b WHERE t < b.t2 GROUP BY 1, 2""",

    // q198: both band-disjoint OCC deletes applied to the source — under
    // snapshot-pinned rebase that equals any commit order; head_version
    // = 2 proves B rebased
    "q198_occ_range_delete" ->
      s"""WITH k AS (SELECT MAX(o_orderkey) AS m FROM orders)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(2 AS BIGINT) AS head_version
          FROM orders, k
          WHERE NOT (o_orderkey >= k.m // 10 AND o_orderkey <= 2 * (k.m // 10))
            AND NOT (o_orderkey >= 7 * (k.m // 10) AND o_orderkey <= 8 * (k.m // 10))
          GROUP BY 1""",

    // q199: the maintained view must equal a full rebuild of the
    // TWICE-merged table — replacement semantics make the CASE
    // arithmetic order-free (%89 rows end at p*3/'8-M2' regardless of
    // whether %97 doubled them first)
    "q199_stream_cdc_view" ->
      s"""WITH m AS (
            SELECT CASE WHEN o_orderkey % 89 = 0 THEN '8-M2'
                        WHEN o_orderkey % 97 = 0 THEN '9-MERGED'
                        ELSE o_orderpriority END AS o_orderpriority,
                   CASE WHEN o_orderkey % 89 = 0 THEN o_totalprice * 3
                        WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                        ELSE o_totalprice END AS o_totalprice
            FROM orders
            UNION ALL
            SELECT '9-MERGED' AS o_orderpriority,
                   o_totalprice + 5 AS o_totalprice
            FROM orders WHERE o_orderkey % 601 = 0)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM m GROUP BY 1""",

    // q195/q196/q197: the SQL-string path must be observationally
    // identical to its Scala twin — same oracles as q181/q179/q185
    "q195_sql_merge" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                    '9-MERGED' AS o_orderpriority,
                    o_totalprice + 5 AS o_totalprice
                  FROM orders WHERE o_orderkey % 601 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up
                     UNION ALL SELECT * FROM ins)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM merged GROUP BY 1""",

    "q196_sql_delete_vacuum" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders
          WHERE NOT (o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o_orderdate <= TIMESTAMP '1995-12-31')
          GROUP BY 1""",

    "q197_sql_time_travel" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up),
          headt AS (SELECT * FROM merged
                    WHERE o_orderkey NOT BETWEEN 1 AND 3000)
          SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1, 2
          UNION ALL
          SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM headt GROUP BY 1, 2""",

    // q200/q201: the OCC SQL path must be observationally identical to
    // its Scala twin (q181's / q179's oracles) AND prove the
    // transactional path ran: head_version = 1 is v0 bootstrap + exactly
    // one rebase commit
    "q200_sql_occ_merge" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice
                      FROM orders WHERE o_orderkey % 97 = 0),
          ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                    '9-MERGED' AS o_orderpriority,
                    o_totalprice + 5 AS o_totalprice
                  FROM orders WHERE o_orderkey % 601 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice
                   FROM orders WHERE o_orderkey % 97 <> 0),
          merged AS (SELECT * FROM keep UNION ALL SELECT * FROM up
                     UNION ALL SELECT * FROM ins)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(1 AS BIGINT) AS head_version
          FROM merged GROUP BY 1""",

    "q201_sql_occ_delete" ->
      s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS y, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(1 AS BIGINT) AS head_version
          FROM orders
          WHERE NOT (o_orderdate >= TIMESTAMP '1995-01-01'
                     AND o_orderdate <= TIMESTAMP '1995-12-31')
          GROUP BY 1""",

    // q203: the feed-rebuilt table must equal both band-disjoint merges
    // applied to the source (q192's arithmetic, F-tagged) — under OCC
    // rebase that equals any commit order
    "q203_occ_feed_replay" ->
      s"""WITH k AS (SELECT MAX(o_orderkey) // 3 AS lo3,
                            2 * (MAX(o_orderkey) // 3) AS hi3 FROM orders),
          m AS (SELECT CASE
                    WHEN o_orderkey <= k.lo3 AND o_orderkey % 97 = 0 THEN '9-F-A'
                    WHEN o_orderkey >= k.hi3 AND o_orderkey % 89 = 0 THEN '9-F-B'
                    ELSE o_orderpriority END AS o_orderpriority,
                  CASE
                    WHEN o_orderkey <= k.lo3 AND o_orderkey % 97 = 0 THEN o_totalprice * 2
                    WHEN o_orderkey >= k.hi3 AND o_orderkey % 89 = 0 THEN o_totalprice * 3
                    ELSE o_totalprice END AS o_totalprice
                FROM orders, k)
          SELECT o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM m GROUP BY 1""",

    // q204: both snapshots recomputed set-theoretically — the head with
    // the evolved column (null-filled to 0 outside the delta, price/2 —
    // a binary-exact halving — inside it), the pinned v0 with the
    // literal 0 its pre-evolution schema forces
    "q204_occ_schema_evolution" ->
      s"""WITH up AS (SELECT o_orderkey, '9-MERGED' AS o_orderpriority,
                        o_totalprice * 2 AS o_totalprice,
                        o_totalprice * 2 / 2 AS o_bonus
                      FROM orders WHERE o_orderkey % 97 = 0),
          keep AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
                     CAST(NULL AS DOUBLE) AS o_bonus
                   FROM orders WHERE o_orderkey % 97 <> 0),
          m AS (SELECT * FROM keep UNION ALL SELECT * FROM up)
          SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 ${Sql.dsum("COALESCE(o_bonus, 0)")} AS sum_bonus
          FROM m GROUP BY 1, 2
          UNION ALL
          SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 ${Sql.dsum("0")} AS sum_bonus
          FROM orders GROUP BY 1, 2""",

    // q205: the cursor-maintained view must equal a full rebuild of the
    // THRICE-merged table — replacement semantics make the last-applied
    // merge win for keys matched by several (deltas derive from the
    // source, so the final value is the last delta's, computed from the
    // original row)
    "q205_occ_feed_incremental" ->
      s"""WITH m AS (SELECT CASE
                    WHEN o_orderkey % 101 = 0 THEN '9-I-C'
                    WHEN o_orderkey % 89 = 0 THEN '9-I-B'
                    WHEN o_orderkey % 97 = 0 THEN '9-I-A'
                    ELSE o_orderpriority END AS o_orderpriority,
                  CASE
                    WHEN o_orderkey % 101 = 0 THEN o_totalprice + 7
                    WHEN o_orderkey % 89 = 0 THEN o_totalprice * 3
                    WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
                FROM orders)
          SELECT o_orderpriority, COUNT(*) AS n, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM m GROUP BY 1""",

    // q206: base ∪ inserted on both the plain and the OCC side, with the
    // OCC side's committed version (v0 bootstrap + one INSERT = 1)
    "q206_sql_insert" ->
      s"""WITH ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                         '9-MERGED' AS o_orderpriority,
                         o_totalprice + 5 AS o_totalprice
                       FROM orders WHERE o_orderkey % 601 = 0),
          m AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
                UNION ALL SELECT * FROM ins)
          SELECT side, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(1 AS BIGINT) AS occ_version
          FROM m, (SELECT 'plain' AS side UNION ALL SELECT 'occ') sides
          GROUP BY 1, 2""",

    // q207: everything the 3-file replay delivers (ts < t0+14d), by
    // event type — any row duplicated by the crash replay, lost by the
    // racing compaction, or double-committed by the rebase breaks it
    "q207_occ_stream_ingest" ->
      s"""WITH e AS (SELECT event_type, value, CAST(ts AS TIMESTAMP) AS t FROM events),
          b AS (SELECT date_trunc('day', MIN(t)) + INTERVAL 14 DAY AS t2 FROM e)
          SELECT event_type, COUNT(*) AS n, ${Sql.dsum("value")} AS sum_value
          FROM e, b WHERE t < b.t2 GROUP BY 1""",

    // q208: head = base ∪ old-shape inserts (null bonus) ∪ new-shape
    // inserts (price/4 bonus); v0 = the untouched base with the literal
    // zeros the pre-ALTER schema forces
    "q208_sql_alter_add_column" ->
      s"""WITH old_ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                 '9-MERGED' AS o_orderpriority,
                 o_totalprice + 5 AS o_totalprice,
                 CAST(NULL AS DOUBLE) AS o_bonus
               FROM orders WHERE o_orderkey % 601 = 0),
          new_ins AS (SELECT o_orderkey + 200000000 AS o_orderkey,
                 '9-BONUS' AS o_orderpriority,
                 o_totalprice,
                 o_totalprice / 4 AS o_bonus
               FROM orders WHERE o_orderkey % 997 = 0),
          m AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
                       CAST(NULL AS DOUBLE) AS o_bonus FROM orders
                UNION ALL SELECT * FROM old_ins
                UNION ALL SELECT * FROM new_ins)
          SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 COUNT(o_bonus) AS n_bonus,
                 ${Sql.dsum("COALESCE(o_bonus, 0)")} AS sum_bonus
          FROM m GROUP BY 1, 2
          UNION ALL
          SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price,
                 CAST(0 AS BIGINT) AS n_bonus, ${Sql.dsum("0")} AS sum_bonus
          FROM orders GROUP BY 1, 2""",

    // q209: compaction is content-preserving at BOTH snapshots — the head
    // (compacted files) and the pre-OPTIMIZE pin must equal the source
    "q209_sql_optimize" ->
      s"""SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1, 2
          UNION ALL
          SELECT 'v0' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY 1, 2""",

    // q210: v1 = orders ∪ inserts; v2 = v1 minus the deleted key range;
    // head = v1 exactly (the restore) — all three recomputed
    // set-theoretically from the source
    "q210_sql_restore" ->
      s"""WITH ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                 '9-MERGED' AS o_orderpriority,
                 o_totalprice + 5 AS o_totalprice
               FROM orders WHERE o_orderkey % 601 = 0),
          v1 AS (SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
                 UNION ALL SELECT * FROM ins),
          v2 AS (SELECT * FROM v1
                 WHERE NOT (o_orderkey BETWEEN 100 AND 50000))
          SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM v1 GROUP BY 1, 2
          UNION ALL
          SELECT 'v1' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM v1 GROUP BY 1, 2
          UNION ALL
          SELECT 'v2' AS snap, o_orderpriority, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM v2 GROUP BY 1, 2""",

    // q211: the scattered v0 box, the z-ordered head box, and the
    // full-table head rollup all recomputed from the source — layout
    // changes must be invisible to every one of them
    "q211_sql_zorder" ->
      s"""WITH pts AS (SELECT o_orderkey,
                 (${Sql.keyHash("o_orderkey")} % 256) AS x,
                 (${Sql.keyHash("(o_custkey * 131)")} % 256) AS y,
                 o_totalprice
               FROM orders),
          inbox AS (SELECT * FROM pts
                    WHERE x BETWEEN 64 AND 95 AND y BETWEEN 160 AND 191)
          SELECT 'v0' AS snap, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM inbox
          UNION ALL
          SELECT 'head' AS snap, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM inbox
          UNION ALL
          SELECT 'head_all' AS snap, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM pts""",

    // q202: both snapshots' box aggregates recomputed set-theoretically
    // from the source — 2D pruning at either version must be invisible
    "q202_occ_2d_travel" ->
      s"""WITH pts AS (SELECT o_orderkey,
                 (${Sql.keyHash("o_orderkey")} % 256) AS x,
                 (${Sql.keyHash("(o_custkey * 131)")} % 256) AS y,
                 o_totalprice
               FROM orders),
          inbox AS (SELECT * FROM pts
                    WHERE x BETWEEN 64 AND 95 AND y BETWEEN 160 AND 191),
          m AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN o_totalprice * 2
                            ELSE o_totalprice END AS p
                FROM inbox)
          SELECT 'v0' AS snap, COUNT(*) AS n,
                 ${Sql.dsum("o_totalprice")} AS sum_price
          FROM inbox
          UNION ALL
          SELECT 'head' AS snap, COUNT(*) AS n, ${Sql.dsum("p")} AS sum_price
          FROM m""",

    "q121_incremental_view" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders, ${Sql.dsum("o_totalprice")} AS sum_price
          FROM orders GROUP BY o_custkey""",

    // the exact counts replay fully; `ok` replays as the literal the
    // STRUCTURAL CMS guarantee forces (counters only increment, so
    // est ≥ exact on every dataset — the probabilistic eps·N overshoot
    // is spec-asserted, not hash-gated)
    "q158_cms_heavy_hitters" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS exact FROM events
                    GROUP BY user_id ORDER BY exact DESC, user_id LIMIT 50)
          SELECT user_id, exact, TRUE AS ok FROM c
          ORDER BY exact DESC, user_id""",

    // counts stay INDEPENDENT (full corpus count, no candidate pruning) so
    // a candidate-set miss still hash-mismatches; only the `sound` bound
    // arithmetic replays the sampled-candidate pipeline
    // The CMS arithmetic is replayed cell-for-cell: same portable md5
    // hash, same (row ':' token) keying, same width — the oracle derives
    // the identical tail_ub and certificate bit.
    "q122_heavy_hitters" ->
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
          samp AS (SELECT token, COUNT(*) AS cnt FROM tok
                   WHERE ${Sql.keyHash("doc_id")} % 10 < 3
                   GROUP BY token ORDER BY cnt DESC, token LIMIT 400),
          top25 AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token
                    ORDER BY n DESC, token LIMIT 25),
          e25 AS (SELECT MIN(n) AS exact25 FROM top25),
          tail AS (SELECT token FROM tok
                   WHERE token NOT IN (SELECT token FROM samp)),
          cells AS (SELECT r, ${TextOps.hash32Sql("concat(CAST(r AS VARCHAR), ':', token)")} % 65536 AS cell,
                      COUNT(*) AS c
                    FROM tail CROSS JOIN range(4) t(r) GROUP BY 1, 2),
          rowmax AS (SELECT r, MAX(c) AS mc FROM cells GROUP BY r),
          ub AS (SELECT COALESCE(MIN(mc), 0) AS tail_ub FROM rowmax)
          SELECT token, CAST(n AS BIGINT) AS n,
                 CAST(ub.tail_ub AS BIGINT) AS tail_ub,
                 (e25.exact25 >= ub.tail_ub) AS sound
          FROM top25, e25, ub ORDER BY n DESC, token""",

    "q123_bigram_lm_score" -> {
      val ngrams = TextOps.wordNgramsSql("w", 2)
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          bi AS (SELECT doc_id, unnest($ngrams) AS b FROM ws),
          cb AS (SELECT b, COUNT(*) AS cb FROM bi GROUP BY b),
          cu AS (SELECT string_split(b, ' ')[1] AS w1, COUNT(*) AS cu FROM bi GROUP BY 1),
          v AS (SELECT COUNT(DISTINCT string_split(b, ' ')[1]) AS v FROM bi),
          sc AS (SELECT doc_id,
                   round(ln(CAST(cb.cb + 1 AS DOUBLE) / CAST(cu.cu + v.v AS DOUBLE)), 6) AS lp
                 FROM bi JOIN cb USING (b)
                 JOIN cu ON string_split(bi.b, ' ')[1] = cu.w1 CROSS JOIN v)
          SELECT doc_id, COUNT(*) AS n_bigrams,
                 ${Sql.dsum6("lp")} AS sum_logprob
          FROM sc GROUP BY doc_id"""
    },

    "q124_zorder_tiles" -> {
      val z = ZOrder.zValueSql("l_partkey", "l_suppkey", 8)
      s"""WITH pts AS (SELECT $z AS z,
                 ((l_partkey % 256 + 256) % 256) AS x,
                 ((l_suppkey % 256 + 256) % 256) AS y
               FROM lineitem)
          SELECT (z >> 10) AS tile, COUNT(*) AS n,
                 MIN(x) AS min_x, MAX(x) AS max_x,
                 MIN(y) AS min_y, MAX(y) AS max_y
          FROM pts GROUP BY tile"""
    },

    "q125_negative_sampling" ->
      s"""WITH np AS (SELECT COUNT(*) AS np FROM part),
          cand AS (SELECT s_suppkey, k,
                     ${Sql.keyHash("(s_suppkey * 131 + k)")} % np AS neg_partkey
                   FROM supplier, np, LATERAL UNNEST(range(1, 9)) AS t(k)),
          pos AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
          SELECT c.s_suppkey, c.k, c.neg_partkey,
                 p.l_partkey IS NOT NULL AS collided
          FROM cand c LEFT JOIN pos p
            ON c.s_suppkey = p.l_suppkey AND c.neg_partkey = p.l_partkey""",

    "q126_bloom_decontam" -> {
      val ngrams = TextOps.wordNgramsSql("w", 5)
      s"""WITH ws AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
          gr AS (SELECT doc_id, source, unnest(list_distinct($ngrams)) AS s FROM ws),
          gh AS (SELECT doc_id, source, ${TextOps.hash32Sql("s")} AS g FROM gr),
          bench AS (SELECT DISTINCT g FROM gh WHERE doc_id % 17 = 0),
          fl AS (SELECT doc_id, source, COUNT(*) AS n_shared
                 FROM gh JOIN bench USING (g) WHERE doc_id % 17 <> 0
                 GROUP BY doc_id, source),
          tot AS (SELECT source, COUNT(*) AS n_train FROM ws
                  WHERE doc_id % 17 <> 0 GROUP BY source),
          agg AS (SELECT source, COUNT(*) AS n_contaminated,
                    SUM(n_shared) AS shared_grams
                  FROM fl GROUP BY source)
          SELECT t.source, t.n_train,
                 CAST(COALESCE(a.n_contaminated, 0) AS BIGINT) AS n_contaminated,
                 CAST(COALESCE(a.shared_grams, 0) AS BIGINT) AS shared_grams
          FROM tot t LEFT JOIN agg a ON a.source = t.source"""
    }
  )
}
