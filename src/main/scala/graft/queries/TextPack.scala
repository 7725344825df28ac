package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.QueryPack
import graft.io.Tables
import graft.text.TextOps

/** Text-analysis surface over the documents corpus: token statistics,
  * quality scoring, stopword-profile language ID, and position-aware
  * document fingerprinting. All projection-only expressions.
  */
object TextPack extends QueryPack {

  /** Stopword profiles per language. The synthetic corpus shares one
    * vocabulary across langs, so these are engine-exercise profiles —
    * the operator (profile scoring + argmax with deterministic tie-break)
    * is what's under test, not linguistics. */
  private val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "und", "hash", "merge"),
    "en" -> Seq("the", "a", "data", "key"),
    "es" -> Seq("el", "la", "row", "table"),
    "fr" -> Seq("le", "la", "join", "sort"),
    "zh" -> Seq("spark", "stream", "batch"))

  private val stoplist = TextOps.DefaultStoplist

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace + BPE-ish subword regex) + diversity.
    "q36_token_stats" -> { (s, d) =>
      val w = TextOps.words(col("text"))
      Tables.documents(s, d).select(
        col("doc_id"),
        size(w).cast("long").as("n_tokens"),
        size(array_distinct(w)).cast("long").as("n_types"),
        (aggregate(w, lit(0L), (acc, t) => acc + length(t)).cast("double")
          / size(w).cast("double")).as("avg_token_len"),
        (size(array_distinct(w)).cast("double") / size(w).cast("double")).as("ttr"),
        size(regexp_extract_all(col("text"), lit(TextOps.SubwordPattern), lit(0)))
          .cast("long").as("n_subwords"))
    },

    // reference-free quality score from length/diversity/stopword signals.
    "q37_quality_score" -> { (s, d) =>
      val w = TextOps.words(col("text"))
      val nTokens = size(w)
      val nTypes = size(array_distinct(w))
      val stopHits = TextOps.profileHits(w, stoplist)
      Tables.documents(s, d).select(
        col("doc_id"),
        nTokens.cast("long").as("n_tokens"),
        stopHits.cast("long").as("stop_hits"),
        TextOps.qualityScore(nTokens, nTypes, stopHits).as("quality"))
    },

    // language ID: per-profile hit score, argmax with lang-asc tie-break.
    "q38_langid" -> { (s, d) =>
      val w = TextOps.words(col("text"))
      val scored = Tables.documents(s, d).select(
        col("doc_id") +: profiles.map { case (lang, prof) =>
          TextOps.profileHits(w, prof).cast("long").as(s"s_$lang")
        }: _*)
      val long = scored.selectExpr("doc_id",
        s"stack(${profiles.size}, ${profiles.map { case (l, _) => s"'$l', s_$l" }.mkString(", ")}) as (lang, score)")
      val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("lang").asc)
      long.withColumn("rn", row_number().over(win)).filter(col("rn") === 1)
        .select(col("doc_id"), col("lang").as("pred_lang"), col("score"))
    },

    // position-aware rolling fingerprint (XOR of positioned token hashes).
    "q39_fingerprint" -> { (s, d) =>
      Tables.documents(s, d).select(
        col("doc_id"), TextOps.fingerprint(TextOps.words(col("text"))).as("fp"))
    },

    // per-source document cap (domain capping in a training-data mix):
    // deterministic hash-ordered top-N per source — every engine/run keeps
    // the SAME documents. The per-group rank is a single hash-partitioned
    // window; no global sort, no sampling-rate second pass.
    "q82_per_source_cap" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val cap = 30
      val w = Window.partitionBy("source")
        .orderBy(graft.util.Parity.keyHash(col("doc_id")).asc, col("doc_id").asc)
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("rn") <= cap, 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("rn") <= cap, col("n_chars")).otherwise(0L)).as("kept_chars"))
    },

    // q82's AGGREGATE twin: the same per-source cap through the custom
    // mergeable topk_collect (TypedImperativeAggregate) instead of a
    // window — partial aggregation reduces each map slice to a k-sized
    // heap per source and the shuffle carries only those states, where
    // the window form shuffles and sorts EVERY row. Identical output
    // (total order on (hash, id)); the plan contract (no Window, object
    // hash aggregate) is spec-asserted.
    "q107_per_source_cap_agg" -> { (s, d) =>
      val cap = 30
      Tables.documents(s, d)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          org.apache.spark.sql.graft.TopKCollect(
            graft.util.Parity.keyHash(col("doc_id")), col("doc_id"),
            col("n_chars"), cap).as("kept"))
        .select(col("source"), col("n_total"),
          size(col("kept")).cast("long").as("n_kept"),
          aggregate(col("kept"), lit(0L), (acc, x) => acc + x.getField("payload"))
            .as("kept_chars"))
    },

    // feature hashing (the hashing-trick featurizer): token → fixed
    // bucket via the PORTABLE md5-derived hash (MLlib's HashingTF uses
    // murmur3, which DuckDB cannot replay), so the whole featurization is
    // oracle-replayable. Fixed output dimensionality regardless of vocab
    // size — the no-vocabulary-broadcast featurizer for unbounded corpora.
    // Checked at the aggregate level: per-bucket term and document counts.
    "q86_hashed_features" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
        .select(col("doc_id"), pmod(TextOps.hash32(col("term")), lit(64)).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_terms"), countDistinct(col("doc_id")).as("n_docs"))
    },

    // whitespace normalization over deterministically-injected noise
    // (every 3rd doc gains tab/newline junk): collapse runs, trim, and
    // prove the character-level work with an md5 of the cleaned text —
    // a pure projection at scan speed; DuckDB replays regex + md5 exactly
    // (its regexp_replace needs the 'g' flag to match Spark's
    // replace-all semantics).
    "q144_text_normalize" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit("\t  trailing junk \n "))
            .otherwise(lit(""))).as("noisy"))
        .select(col("doc_id"), length(col("noisy")).cast("long").as("raw_len"),
          trim(regexp_replace(col("noisy"), "\\s+", " ")).as("clean"))
        .select(col("doc_id"), col("raw_len"),
          length(col("clean")).cast("long").as("clean_len"), md5(col("clean")).as("h"))
    },

    // vocabulary pruning (min-df ≥ 3 + stoplist) with ORDER-PRESERVING
    // re-aggregation: posexplode carries the position, the kept tokens
    // re-assemble via sort-by-position — the general pattern for any
    // token-level rewrite that must keep document order through a
    // shuffle. The df table shuffles once on the token key; df ≥ 3 keeps
    // the join side bounded.
    "q145_vocab_prune" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(TextOps.words(col("text"))).as(Seq("pos", "t")))
      val keep = toks.select(col("t"), col("doc_id")).distinct()
        .groupBy("t").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 3)
        .select("t")
      toks.join(keep, "t")
        .filter(!col("t").isin(TextOps.DefaultStoplist.map(x => x: Any): _*))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("pos"), col("t")))),
            x => x.getField("t")), " ").as("clean"))
        .select(col("doc_id"), col("n_kept"), md5(col("clean")).as("h"))
    },

    // TF-IDF featurization: global top-20 (doc, term) pairs by smoothed
    // tf·idf — deterministic ordering on (rounded score desc, doc, term)
    // so the cut set is engine-portable.
    "q81_tfidf_topterms" -> { (s, d) =>
      TextOps.tfidf(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("tfidf").desc, col("doc_id").asc, col("term").asc)
        .limit(20)
        .select(col("doc_id"), col("term"), col("tf"), col("df"), col("tfidf"))
    }
  )

  override def oracles: Map[String, String] = Map(
    "q36_token_stats" ->
      s"""SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
           CAST(list_sum(list_transform(w, t -> length(t))) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS avg_token_len,
           CAST(len(list_distinct(w)) AS DOUBLE) / CAST(len(w) AS DOUBLE) AS ttr,
           CAST(len(regexp_extract_all(text, '${TextOps.SubwordPattern}')) AS BIGINT) AS n_subwords
         FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)""",

    "q37_quality_score" -> {
      val stop = stoplist.map(t => s"'$t'").mkString(", ")
      s"""SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(stop_hits AS BIGINT) AS stop_hits,
           least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.4
             + (CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
             + least((CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 5.0, 1.0) * 0.3 AS quality
          FROM (SELECT doc_id, len(w) AS n_tokens, len(list_distinct(w)) AS n_types,
                  len(list_filter(w, t -> t IN ($stop))) AS stop_hits
                FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))"""
    },

    "q38_langid" -> {
      val scoreCols = profiles.map { case (lang, prof) =>
        val in = prof.map(t => s"'$t'").mkString(", ")
        s"SELECT doc_id, '$lang' AS lang, CAST(len(list_filter(w, t -> t IN ($in))) AS BIGINT) AS score FROM ws"
      }.mkString(" UNION ALL ")
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          long AS ($scoreCols),
          ranked AS (SELECT doc_id, lang, score,
                       ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
                     FROM long)
          SELECT doc_id, lang AS pred_lang, score FROM ranked WHERE rn = 1"""
    },

    "q39_fingerprint" ->
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          pos AS (SELECT doc_id, unnest(w) || ':' || CAST(unnest(range(0, len(w))) AS VARCHAR) AS pt
                  FROM ws),
          hs AS (SELECT doc_id, ${TextOps.hash32Sql("pt")} AS h FROM pos)
          SELECT doc_id, CAST(bit_xor(h) AS BIGINT) AS fp FROM hs GROUP BY doc_id""",

    "q86_hashed_features" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          b AS (SELECT doc_id, ${TextOps.hash32Sql("term")} % 64 AS bucket FROM t)
          SELECT bucket, COUNT(*) AS n_terms, COUNT(DISTINCT doc_id) AS n_docs
          FROM b GROUP BY bucket""",

    // identical semantics to q82 — the oracle is the same window replay;
    // what differs (and what the spec pins) is the PLAN.
    "q107_per_source_cap_agg" ->
      s"""WITH r AS (SELECT source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY ${graft.util.Parity.keyHashSql("doc_id")}, doc_id) AS rn
               FROM documents)
          SELECT source, COUNT(*) AS n_total,
                 CAST(SUM(CASE WHEN rn <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN rn <= 30 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
          FROM r GROUP BY source""",

    "q82_per_source_cap" ->
      s"""WITH r AS (SELECT source, n_chars,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY ${graft.util.Parity.keyHashSql("doc_id")}, doc_id) AS rn
               FROM documents)
          SELECT source, COUNT(*) AS n_total,
                 CAST(SUM(CASE WHEN rn <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                 CAST(SUM(CASE WHEN rn <= 30 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
          FROM r GROUP BY source""",

    "q144_text_normalize" ->
      """WITH n AS (SELECT doc_id,
                 text || CASE WHEN doc_id % 3 = 0 THEN e'\t  trailing junk \n ' ELSE '' END AS noisy
               FROM documents),
          c AS (SELECT doc_id, CAST(length(noisy) AS BIGINT) AS raw_len,
                  trim(regexp_replace(noisy, '\s+', ' ', 'g')) AS clean
                FROM n)
          SELECT doc_id, raw_len, CAST(length(clean) AS BIGINT) AS clean_len,
                 md5(clean) AS h
          FROM c""",

    "q145_vocab_prune" -> {
      val stop = graft.text.TextOps.DefaultStoplist.map(t => s"'$t'").mkString(", ")
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
          tk AS (SELECT doc_id, i - 1 AS pos, w[i] AS t
                 FROM ws, LATERAL UNNEST(range(1, len(w) + 1)) AS r(i)),
          keep AS (SELECT t FROM (SELECT t, COUNT(DISTINCT doc_id) AS df FROM tk GROUP BY t)
                   WHERE df >= 3)
          SELECT doc_id, COUNT(*) AS n_kept,
                 md5(string_agg(t, ' ' ORDER BY pos)) AS h
          FROM tk JOIN keep USING (t)
          WHERE t NOT IN ($stop)
          GROUP BY doc_id"""
    },

    "q81_tfidf_topterms" ->
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
          tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY doc_id, term),
          dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
          n AS (SELECT COUNT(*) AS n_docs FROM documents)
          SELECT doc_id, term, tf, df,
                 round(tf * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 6) AS tfidf
          FROM tf JOIN dft USING (term), n
          ORDER BY tfidf DESC, doc_id, term LIMIT 20"""
  )
}
