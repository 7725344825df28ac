package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryPack
import graft.io.Tables
import graft.dedup.Dedup
import graft.text.TextOps

/** Deduplication surface over the documents corpus: exact content-hash
  * dedup, MinHash+LSH banding, SimHash signatures, and exact n-gram
  * Jaccard verification. Near-dup paths run on a deterministically
  * augmented corpus (orig ∪ perturbed copies) so candidate generation has
  * guaranteed positives to find.
  */
object DedupPack extends QueryPack {
  import Dedup.MinHashParams._

  /** Fan the single-split documents scan out: shingling + minhash math
    * per row dominates every dedup query (no-op at scale). */
  private def docsFanned(s: SparkSession, d: String): DataFrame =
    graft.relational.Scale.fanOut(Tables.documents(s, d).select("doc_id", "text"))

  /** documents ∪ exact copies of every 10th doc (ids + 200000). */
  private def dupCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = docsFanned(s, d)
    docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  }

  /** documents ∪ near-copies (first word dropped) of every 5th doc. */
  private def augCorpus(s: SparkSession, d: String): DataFrame = {
    val docs = docsFanned(s, d)
    docs.unionByName(
      docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          expr("substring(text, instr(text, ' ') + 1, length(text))").as("text")))
  }

  private val dupCorpusSql =
    """dup AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)"""

  private val augCorpusSql =
    """aug AS (SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, substring(text, strpos(text, ' ') + 1) AS text
              FROM documents WHERE doc_id % 5 = 0)"""

  /** Shared oracle CTEs: shingle hashes → minhashes → band signatures. */
  private def bandSqlCtes(corpus: String): String = {
    val w = s"string_split(text, ' ')"
    val ngrams = TextOps.wordNgramsSql("w", 3)
    s"""ws AS (SELECT doc_id, $w AS w FROM $corpus),
       sh AS (SELECT doc_id, unnest($ngrams) AS s FROM ws WHERE len(w) >= 3),
       hs AS (SELECT doc_id, ${TextOps.hash32Sql("s")} AS h FROM sh),
       mh AS (SELECT doc_id, j,
                MIN((((j * 2654435761 + 40503) % $P) * (h % $P) + ((j * 1103515245 + 101) % $P)) % $P) AS m
              FROM hs, range(0, $k) t(j) GROUP BY doc_id, j),
       bandtab AS (SELECT doc_id, CAST(j // $rowsPerBand AS BIGINT) AS band,
                     string_agg(CAST(m AS VARCHAR), '_' ORDER BY j) AS sig
                   FROM mh GROUP BY doc_id, j // $rowsPerBand)"""
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── q160: STREAMING near-dup admission against a static LSH index ──
    // The 100 TB ingest shape: the historical corpus (doc_id % 3 ≠ 0) is
    // banded ONCE into the q30-style LSH index; newly ARRIVING documents
    // (doc_id % 3 = 0, replayed as a file stream) minhash themselves
    // map-side and probe the index with a stream-STATIC equi-join on
    // (band, sig) — no stream-stream state, no all-pairs, each new doc
    // touches only its own band buckets. The index is broadcast at test
    // scale; at corpus scale the same plan runs as a shuffled join
    // against the bucketed index table, with the probe side partitioned
    // by the identical (band, sig) key. dropDuplicates collapses multi-
    // band collisions (state is bounded by the emitted pair set; a
    // production stream would watermark on arrival time to age it out).
    "q160_stream_lsh_dedup" -> { (s, d) =>
      import graft.streaming.Streams
      val index = Dedup.bandTable(
          Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) =!= 0),
          "doc_id", "text")
        .withColumnRenamed("doc_id", "dup_of")
      val probes = Dedup.bandTable(
        Streams.documentsStream(s, d).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text")
      val hits = probes.join(broadcast(index), Seq("band", "sig"))
        .select(col("doc_id").as("new_id"), col("dup_of"))
        .dropDuplicates(Seq("new_id", "dup_of"))
      Streams.drainToParquet(hits, "lshstream", "append")
    },

    // ── q178: DELETE from the LSH band index (tombstones) ─────────────
    // The dedup-index corner of the round-8 delete ask (q174 covered the
    // ANN segment): a doc retired from the historical corpus — GDPR
    // delete, or a canonical doc superseded by a better copy — must stop
    // matching as `dup_of` in the admission probe. Same mechanism as the
    // ANN path: the tombstone id-set anti-joins out of the band index at
    // probe time (band rows are keyed by doc_id, so the filter is exact),
    // and because band signatures are per-doc, removing one doc cannot
    // change any other doc's rows — the filtered index IS the rebuild
    // without the deleted docs, which is what the oracle replays.
    "q178_lsh_index_delete" -> { (s, d) =>
      val hist = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) =!= 0)
      val index = Dedup.bandTable(hist, "doc_id", "text")
        .withColumnRenamed("doc_id", "dup_of")
      val tombs = hist.filter(pmod(col("doc_id"), lit(5)) === 1)
        .select(col("doc_id").as("dup_of"))
      val live = index.join(broadcast(tombs), Seq("dup_of"), "left_anti")
      val probes = Dedup.bandTable(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(3)) === 0),
        "doc_id", "text")
      probes.join(broadcast(live), Seq("band", "sig"))
        .select(col("doc_id").as("new_id"), col("dup_of")).distinct()
    },

    // exact dedup: hash-groupBy, canonical = min id.
    "q29_exact_dedup" -> { (s, d) =>
      Dedup.exactGroups(dupCorpus(s, d), "doc_id", "text")
    },

    // MinHash band signatures (the LSH index) for the plain corpus.
    "q30_minhash_bands" -> { (s, d) =>
      Dedup.bandTable(docsFanned(s, d), "doc_id", "text")
        .select(col("doc_id"), col("band").cast("long").as("band"), col("sig"))
    },

    // LSH candidate pairs on the augmented corpus (must find the planted
    // near-dups via band-bucket join — no all-pairs product).
    "q31_minhash_pairs" -> { (s, d) =>
      Dedup.candidatePairs(Dedup.bandTable(augCorpus(s, d), "doc_id", "text"), "doc_id")
    },

    // connected components over the LSH candidate pairs — near-dup CLUSTER
    // canonicalization (keep-one-per-cluster is then a filter on
    // comp == node). Distributed min-label propagation; the oracle replays
    // the full pair derivation plus a recursive-CTE reachability closure.
    "q85_dedup_components" -> { (s, d) =>
      val pairs = Dedup.candidatePairs(
        Dedup.bandTable(augCorpus(s, d), "doc_id", "text"), "doc_id")
      // CC materializes its own result cache, so the pair cache has no
      // further reader (candidatePairs caller contract) — release it even
      // if CC throws.
      val comps =
        try Dedup.connectedComponents(pairs, "id_a", "id_b")
        finally pairs.unpersist()
      comps.groupBy("comp").agg(count(lit(1)).as("n_members"))
    },

    // canonical-document selection: for every near-dup cluster keep the
    // HIGHEST-QUALITY member (tie-break: lowest id) — the
    // dedup-with-taste policy real corpus pipelines want instead of
    // keep-first. Components come from the same LSH pair derivation as
    // q85; quality is the shared q37 formula, joined per member and
    // reduced by one per-cluster window (clusters are tiny, so the
    // window partitions are too).
    "q96_canonical_selection" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val corpus = augCorpus(s, d)
      val pairs = Dedup.candidatePairs(
        Dedup.bandTable(corpus, "doc_id", "text"), "doc_id")
      val comps =
        try Dedup.connectedComponents(pairs, "id_a", "id_b")
        finally pairs.unpersist()
      val w = TextOps.words(col("text"))
      val quality = corpus.select(col("doc_id"),
        TextOps.qualityScore(size(w), size(array_distinct(w)),
          TextOps.profileHits(w, TextOps.DefaultStoplist)).as("quality"))
      val members = comps.join(quality, comps("node") === quality("doc_id"))
        .select(col("comp"), col("node"), col("quality"))
      val win = Window.partitionBy("comp")
        .orderBy(col("quality").desc, col("node").asc)
      val canon = members.withColumn("rn", row_number().over(win))
        .filter(col("rn") === 1)
        .select(col("comp"), col("node").as("canonical_id"),
          graft.util.Parity.r6(col("quality")).as("best_quality"))
      // sizes from the CACHED comps frame (members ⋈ quality is 1:1 on
      // node, so the counts are identical) — counting members instead
      // would re-run the full quality-scoring corpus scan
      canon.join(
        comps.groupBy("comp").agg(count(lit(1)).as("n_members")), "comp")
    },

    // ---- q147: the COMPOSED training-data prep pipeline ---------------
    // The capstone: near-dup canonicalization (q96) → benchmark
    // decontamination (q95) → quality cut (q37) → temperature mixture
    // sampling (q99) chained as ONE query, emitting the per-source
    // datasheet a data curator reads (row counts through every stage +
    // sampled token budget). Every stage keeps its individually-proven
    // scalable shape; the oracle replays the entire composition end-to-end
    // — a wrong stage ORDER (e.g. sampling before dedup) hash-mismatches,
    // not just a wrong stage.
    "q147_trainprep_pipeline" -> { (s, d) => trainprepPipeline(s, d) },


    // SimHash signatures over token hashes.
    "q32_simhash" -> { (s, d) =>
      val hs = transform(TextOps.words(col("text")), TextOps.hash32(_))
      docsFanned(s, d).select(col("doc_id"), Dedup.simhash32(hs).as("simhash"))
    },

    // exact n-gram Jaccard verification of the planted near-dup pairs.
    "q33_ngram_jaccard" -> { (s, d) =>
      val docs = Tables.documents(s, d).filter(pmod(col("doc_id"), lit(5)) === 0)
      val orig = docs.select(col("doc_id"),
        TextOps.wordNgrams(TextOps.words(col("text")), 3).as("sh_a"))
      val pert = docs.select(col("doc_id"),
        TextOps.wordNgrams(TextOps.words(
          expr("substring(text, instr(text, ' ') + 1, length(text))")), 3).as("sh_b"))
      orig.join(pert, "doc_id")
        .select(col("doc_id"), Dedup.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
        .filter(col("jaccard") >= 0.3)
    }
  )


  /** The q147 pipeline body with a STAGE TAP: `tap(name, df)` is invoked
    * at each stage boundary and returns the frame to continue with —
    * identity for the registered query (plan unchanged), a force-and-time
    * hook for [[trainprepStageTimings]]. Round-8 verdict item: the
    * capstone's 7.8–12 s cross-session band was too wide to attribute,
    * so the bench artifact now carries per-stage walls.
    */
  def trainprepPipeline(s: SparkSession, d: String,
                        tap: (String, DataFrame) => DataFrame = (_, df) => df): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      import graft.util.Parity
      val base = graft.relational.Scale.fanOut(
        Tables.documents(s, d).select("doc_id", "text", "source"))
      // EAGER persist discipline (round-13 verdict #1: the capstone's wall
      // was bimodal — 6.8 s one round, 13.8 s the next, on identical code
      // — because cache population was left to whichever downstream job,
      // broadcast-subquery jobs included, happened to touch a persisted
      // frame first; a loss in that race re-ran the corpus scan + fan-out
      // shuffle and the LSH-derived stages instead of sharing them). Every
      // shared frame is now persisted AND counted at its definition, so
      // by the time ANY consumer plans, the frame is a fully-materialized
      // InMemoryRelation — the final datasheet job provably never rescans
      // documents.parquet (TrainprepFusionSpec pins this on the optimized
      // plan). corpus itself is the biggest win: un-persisted it was
      // scanned + fan-out-SHUFFLED three times (band table, quality
      // scoring, raw counts). At cluster scale the cache is
      // MEMORY_AND_DISK and bounded by the fan-out stage's own working
      // set — the same spill envelope the shuffle would need.
      val corpus = base.unionByName(
        base.filter(pmod(col("doc_id"), lit(5)) === 0)
          .select((col("doc_id") + 100000).as("doc_id"),
            expr("substring(text, instr(text, ' ') + 1, length(text))").as("text"),
            col("source"))).persist()
      corpus.count()
      // stage 1: LSH → components → keep best-quality doc per cluster
      val pairs = Dedup.candidatePairs(
        Dedup.bandTable(corpus.select("doc_id", "text"), "doc_id", "text"), "doc_id")
      val comps = tap("lsh_components",
        try Dedup.connectedComponents(pairs, "id_a", "id_b")
        finally pairs.unpersist())
      val tw = TextOps.words(col("text"))
      val scored = corpus.select(col("doc_id"), col("source"), col("text"),
        Parity.r6(TextOps.qualityScore(size(tw), size(array_distinct(tw)),
          TextOps.profileHits(tw, TextOps.DefaultStoplist))).as("q"))
      val members = comps.select(col("node"), col("comp"))
        .join(scored.select(col("doc_id").as("node"), col("q")), "node")
      val demote = members
        .withColumn("rn", row_number().over(
          Window.partitionBy("comp").orderBy(col("q").desc, col("node").asc)))
        .filter(col("rn") > 1).select(col("node").as("doc_id"))
      // d1 feeds the gram derivation twice (bench + train) plus two
      // aggregates — persist the surviving slice once (q99 discipline;
      // the session cache clear keeps bench repeats cold) and MATERIALIZE
      // it eagerly (see the corpus persist note)
      val d1 = tap("canonicalize", {
        val f = scored.join(demote, Seq("doc_id"), "left_anti").persist()
        f.count(); f
      })
      // stage 2: drop the held-out benchmark docs AND any train doc
      // sharing a 5-gram shingle with them
      val grams = d1.select(col("doc_id"),
          explode(array_distinct(TextOps.wordNgrams(TextOps.words(col("text")), 5))).as("sgl"))
        .select(col("doc_id"), TextOps.hash32(col("sgl")).as("g"))
      val bench = grams.filter(pmod(col("doc_id"), lit(17)) === 0).select("g").distinct()
      val flagged = grams.filter(pmod(col("doc_id"), lit(17)) =!= 0)
        .join(broadcast(bench), "g").select("doc_id").distinct()
      // d2 is read twice (the quality floor AND the datasheet's n_clean
      // aggregate): persisting it runs the 5-gram explode / shingle
      // broadcast exactly once per q147 evaluation
      val d2 = tap("decontaminate", {
        val f = d1.filter(pmod(col("doc_id"), lit(17)) =!= 0)
          .join(flagged, Seq("doc_id"), "left_anti").persist()
        f.count(); f
      })
      // stage 3: quality floor
      val d3 = tap("quality_floor", {
        val f = d2.filter(col("q") >= 0.5).persist()
        f.count(); f
      })
      // stage 4: α=0.5 temperature mixture (the q99 arithmetic)
      val counts = d3.groupBy("source").agg(count(lit(1)).as("n_quality"))
        .withColumn("sw", round(sqrt(col("n_quality").cast("double")), 6))
      val tots = counts.agg(sum(col("n_quality")).as("n_all"),
        sum(col("sw").cast("decimal(28,6)")).as("tot_dec"))
      val rates = counts.crossJoin(broadcast(tots))
        .withColumn("thr", floor(least(lit(1.0),
          lit(0.6) * col("n_all").cast("double") * col("sw")
            / col("tot_dec").cast("double") / col("n_quality").cast("double")) * 1000000)
          .cast("long"))
      val kept = tap("mixture_sample", d3.join(broadcast(rates.select("source", "thr")), "source")
        .filter(pmod(Parity.keyHash(col("doc_id")), lit(1000000L)) < col("thr")))
      // stage 5: per-source datasheet
      val raw = corpus.groupBy("source").agg(count(lit(1)).as("n_raw"))
      val a1 = d1.groupBy("source").agg(count(lit(1)).as("n_canon"))
      val a2 = d2.groupBy("source").agg(count(lit(1)).as("n_clean"))
      val a4 = kept.groupBy("source").agg(count(lit(1)).as("n_sampled"),
        sum(size(TextOps.words(col("text")))).as("tok_sampled"))
      raw.join(a1, Seq("source"), "left")
        .join(a2, Seq("source"), "left")
        .join(rates.select("source", "n_quality"), Seq("source"), "left")
        .join(a4, Seq("source"), "left")
        .select(col("source"), col("n_raw"),
          coalesce(col("n_canon"), lit(0L)).as("n_canon"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"),
          coalesce(col("n_quality"), lit(0L)).as("n_quality"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          coalesce(col("tok_sampled"), lit(0L)).as("tok_sampled"))
  }

  /** One INSTRUMENTED q147 run: wall seconds to bring each stage to
    * materialization, in pipeline order (the final entry is the
    * datasheet aggregate + sink). Counts force stages that the lazy
    * composition would fuse, so this run's total ≠ the canonical q147
    * wall — it exists for ATTRIBUTION, not as the headline number. */
  def trainprepStageTimings(s: SparkSession, d: String): Seq[(String, Double)] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var last = System.nanoTime()
    def mark(name: String): Unit = {
      val now = System.nanoTime(); buf += name -> (now - last) / 1e9; last = now
    }
    val res = trainprepPipeline(s, d, (name, df) => { df.count(); mark(name); df })
    res.write.format("noop").mode("overwrite").save()
    mark("datasheet")
    buf.toSeq
  }

  override def oracles: Map[String, String] = Map(
    "q29_exact_dedup" ->
      s"""WITH $dupCorpusSql
          SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
          FROM dup GROUP BY md5(text)""",

    "q30_minhash_bands" ->
      s"""WITH ${bandSqlCtes("documents")}
          SELECT doc_id, band, sig FROM bandtab""",

    // batch replay of the stream-static probe: same band CTEs over the
    // full corpus, split by the arrival predicate at join time
    "q160_stream_lsh_dedup" ->
      s"""WITH ${bandSqlCtes("documents")}
          SELECT DISTINCT p.doc_id AS new_id, ix.doc_id AS dup_of
          FROM bandtab p JOIN bandtab ix ON p.band = ix.band AND p.sig = ix.sig
          WHERE p.doc_id % 3 = 0 AND ix.doc_id % 3 <> 0""",

    // q178: q160's replay minus the tombstoned history docs — the
    // filtered index must equal a rebuild without them
    "q178_lsh_index_delete" ->
      s"""WITH ${bandSqlCtes("documents")}
          SELECT DISTINCT p.doc_id AS new_id, ix.doc_id AS dup_of
          FROM bandtab p JOIN bandtab ix ON p.band = ix.band AND p.sig = ix.sig
          WHERE p.doc_id % 3 = 0 AND ix.doc_id % 3 <> 0 AND ix.doc_id % 5 <> 1""",

    "q31_minhash_pairs" ->
      s"""WITH $augCorpusSql,
          ${bandSqlCtes("aug")}
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bandtab a JOIN bandtab b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id""",

    // q31's full pair replay + recursive reachability closure: component =
    // min id reachable over the undirected pair graph.
    "q85_dedup_components" ->
      s"""WITH RECURSIVE $augCorpusSql,
          ${bandSqlCtes("aug")},
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM bandtab a JOIN bandtab b
                    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
          ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
          reach(node, root) AS (SELECT src, src FROM ed
                                UNION
                                SELECT e.dst, r.root FROM reach r JOIN ed e ON e.src = r.node)
          SELECT comp, COUNT(*) AS n_members FROM (
            SELECT node, MIN(root) AS comp FROM reach GROUP BY node)
          GROUP BY comp""",

    "q96_canonical_selection" -> {
      val stop = TextOps.DefaultStoplist.map(t => s"'$t'").mkString(", ")
      s"""WITH RECURSIVE $augCorpusSql,
          ${bandSqlCtes("aug")},
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM bandtab a JOIN bandtab b
                    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
          ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
          reach(node, root) AS (SELECT src, src FROM ed
                                UNION
                                SELECT e.dst, r.root FROM reach r JOIN ed e ON e.src = r.node),
          comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node),
          q AS (SELECT doc_id,
                  least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                    + (CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
                    + least((CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.3 AS quality
                FROM (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_types,
                        len(list_filter(w, t -> t IN ($stop))) AS stop_hits
                      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM aug))),
          m AS (SELECT c.comp, c.node, q.quality FROM comp c JOIN q ON q.doc_id = c.node),
          r AS (SELECT comp, node, quality,
                  ROW_NUMBER() OVER (PARTITION BY comp ORDER BY quality DESC, node) AS rn
                FROM m),
          sz AS (SELECT comp, COUNT(*) AS n_members FROM m GROUP BY comp)
          SELECT r.comp, r.node AS canonical_id, round(r.quality, 6) AS best_quality,
                 sz.n_members
          FROM r JOIN sz USING (comp) WHERE rn = 1"""
    },

    "q147_trainprep_pipeline" -> {
      val stop = TextOps.DefaultStoplist.map(t => s"'$t'").mkString(", ")
      val ngrams5 = TextOps.wordNgramsSql("w", 5)
      s"""WITH RECURSIVE augp AS (SELECT doc_id, text, source FROM documents
              UNION ALL
              SELECT doc_id + 100000 AS doc_id, substring(text, strpos(text, ' ') + 1) AS text, source
              FROM documents WHERE doc_id % 5 = 0),
          ${bandSqlCtes("augp")},
          pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                    FROM bandtab a JOIN bandtab b
                    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
          ed AS (SELECT id_a AS src, id_b AS dst FROM pairs
                 UNION SELECT id_b, id_a FROM pairs),
          reach(node, root) AS (SELECT src, src FROM ed
                                UNION
                                SELECT e.dst, r.root FROM reach r JOIN ed e ON e.src = r.node),
          comp AS (SELECT node, MIN(root) AS comp FROM reach GROUP BY node),
          scored AS (SELECT doc_id, source, text,
                  round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
                    + (CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
                    + least((CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.3, 6) AS q
                FROM (SELECT doc_id, source, text, len(w) AS n_tokens,
                        len(list_distinct(w)) AS n_types,
                        len(list_filter(w, t -> t IN ($stop))) AS stop_hits
                      FROM (SELECT doc_id, source, text, string_split(text, ' ') AS w FROM augp))),
          dem AS (SELECT node FROM (
                    SELECT c.node,
                      ROW_NUMBER() OVER (PARTITION BY c.comp ORDER BY s2.q DESC, c.node) AS rn
                    FROM comp c JOIN scored s2 ON s2.doc_id = c.node) WHERE rn > 1),
          d1 AS (SELECT * FROM scored WHERE doc_id NOT IN (SELECT node FROM dem)),
          g5 AS (SELECT doc_id, unnest(list_distinct($ngrams5)) AS s
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM d1)),
          gh AS (SELECT doc_id, ${TextOps.hash32Sql("s")} AS g FROM g5),
          bench AS (SELECT DISTINCT g FROM gh WHERE doc_id % 17 = 0),
          flag AS (SELECT DISTINCT doc_id FROM gh JOIN bench USING (g) WHERE doc_id % 17 <> 0),
          d2 AS (SELECT * FROM d1 WHERE doc_id % 17 <> 0
                 AND doc_id NOT IN (SELECT doc_id FROM flag)),
          d3 AS (SELECT * FROM d2 WHERE q >= 0.5),
          counts AS (SELECT source, COUNT(*) AS n_quality,
                       round(sqrt(CAST(COUNT(*) AS DOUBLE)), 6) AS sw
                     FROM d3 GROUP BY source),
          tots AS (SELECT CAST(SUM(n_quality) AS BIGINT) AS n_all,
                     SUM(CAST(sw AS DECIMAL(28,6))) AS tot_dec FROM counts),
          rates AS (SELECT source, n_quality,
                      CAST(floor(least(1.0, 0.6 * CAST(n_all AS DOUBLE) * sw
                        / CAST(tot_dec AS DOUBLE) / CAST(n_quality AS DOUBLE)) * 1000000)
                        AS BIGINT) AS thr
                    FROM counts, tots),
          kept AS (SELECT d3.source, d3.doc_id, d3.text
                   FROM d3 JOIN rates ON rates.source = d3.source
                   WHERE ${graft.util.Parity.keyHashSql("d3.doc_id")} % 1000000 < rates.thr),
          raw AS (SELECT source, COUNT(*) AS n_raw FROM augp GROUP BY source),
          a1 AS (SELECT source, COUNT(*) AS n_canon FROM d1 GROUP BY source),
          a2 AS (SELECT source, COUNT(*) AS n_clean FROM d2 GROUP BY source),
          a4 AS (SELECT source, COUNT(*) AS n_sampled,
                   CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_sampled
                 FROM kept GROUP BY source)
          SELECT r.source, r.n_raw,
                 CAST(COALESCE(a1.n_canon, 0) AS BIGINT) AS n_canon,
                 CAST(COALESCE(a2.n_clean, 0) AS BIGINT) AS n_clean,
                 CAST(COALESCE(rt.n_quality, 0) AS BIGINT) AS n_quality,
                 CAST(COALESCE(a4.n_sampled, 0) AS BIGINT) AS n_sampled,
                 CAST(COALESCE(a4.tok_sampled, 0) AS BIGINT) AS tok_sampled
          FROM raw r LEFT JOIN a1 USING (source) LEFT JOIN a2 USING (source)
            LEFT JOIN rates rt USING (source) LEFT JOIN a4 USING (source)"""
    },

    "q32_simhash" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
          hs AS (SELECT doc_id, ${TextOps.hash32Sql("tok")} AS h FROM toks),
          votes AS (SELECT doc_id, b,
                      SUM(CASE WHEN (h & (1::BIGINT << b)) <> 0 THEN 1 ELSE -1 END) AS vote
                    FROM hs, range(0, 32) t(b) GROUP BY doc_id, b)
          SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
          FROM votes GROUP BY doc_id""",

    "q33_ngram_jaccard" -> {
      val ngrams = TextOps.wordNgramsSql("string_split(text, ' ')", 3)
      val ngramsPert = TextOps.wordNgramsSql("string_split(substring(text, strpos(text, ' ') + 1), ' ')", 3)
      s"""WITH o AS (SELECT doc_id, list_distinct($ngrams) AS sh FROM documents WHERE doc_id % 5 = 0),
          p AS (SELECT doc_id, list_distinct($ngramsPert) AS sh FROM documents WHERE doc_id % 5 = 0),
          j AS (SELECT o.doc_id,
                  CAST(len(list_distinct(list_intersect(o.sh, p.sh))) AS DOUBLE) /
                  CAST(len(o.sh) + len(p.sh) - len(list_distinct(list_intersect(o.sh, p.sh))) AS DOUBLE) AS jaccard
                FROM o JOIN p USING (doc_id))
          SELECT doc_id, jaccard FROM j WHERE jaccard >= 0.3"""
    }
  )
}
