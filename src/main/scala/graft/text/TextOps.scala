package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, portable content hashing, word n-gram shingling,
  * stopword-profile scoring, quality metrics, document fingerprinting.
  * All are single-pass projection expressions — no shuffle, no UDFs —
  * so they run at scan speed on any corpus size.
  *
  * Engine-portable hashing: every hash is derived from `md5` (identical
  * in Spark and DuckDB) via the first 8 hex chars as a 32-bit integer,
  * so the DuckDB oracle can replay bucketing decisions bit-for-bit.
  */
object TextOps {

  /** Whitespace tokenization. */
  def words(text: Column): Column = split(text, " ")

  /** BPE-ish subword pattern (letter runs / single digits / punctuation
    * runs — the GPT-2 pre-tokenizer shape, simplified to constructs that
    * behave identically under Java regex and RE2). Token count via
    * `regexp_extract_all(text, pattern)` in both engines. */
  val SubwordPattern = "[a-z]+|[0-9]|[^a-z0-9 ]+"

  /** Portable 32-bit content hash: int value of md5's first 8 hex chars. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB twin of [[hash32]] (DuckDB 1.0 has no hex→int cast; parse the
    * nibbles arithmetically). */
  def hash32Sql(e: String): String =
    s"CAST(list_sum(list_transform(range(1, 9), i -> " +
      s"CAST(strpos('0123456789abcdef', substring(md5($e), i, 1)) - 1 AS BIGINT) << (4 * (8 - i)))) AS BIGINT)"

  /** Word n-gram shingles (space-joined) — the MinHash/Jaccard input unit. */
  def wordNgrams(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)),
        i => array_join(slice(w, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** DuckDB twin of [[wordNgrams]] over a list column expression `w`. */
  def wordNgramsSql(w: String, n: Int): String =
    s"CASE WHEN len($w) >= $n THEN list_transform(range(1, len($w) - ${n - 2}), " +
      s"i -> array_to_string(($w)[i:i+${n - 1}], ' ')) ELSE [] END"

  /** Count of tokens contained in a fixed profile list (language-ID /
    * stopword-ratio signal). */
  def profileHits(w: Column, profile: Seq[String]): Column =
    size(filter(w, t => t.isin(profile.map(lit(_)): _*)))

  /** Shared stopword list for the quality-score signal (TextPack q37 and
    * the dedup canonical-selection query both score with it, so the two
    * oracles replay the same formula). */
  val DefaultStoplist: Seq[String] = Seq("the", "a", "data", "key", "join")

  /** Heuristic quality score in [0,1]: length saturation, lexical diversity
    * and stopword presence (the shape of reference-free quality filters in
    * public LLM-data pipelines). Pure row-level double math. */
  def qualityScore(nTokens: Column, nTypes: Column, stopHits: Column): Column = {
    val lenScore = least(nTokens.cast("double") / lit(100.0), lit(1.0))
    val ttr = nTypes.cast("double") / nTokens.cast("double")
    val stopRatio = stopHits.cast("double") / nTokens.cast("double")
    lenScore * lit(0.4) + ttr * lit(0.3) + least(stopRatio * lit(5.0), lit(1.0)) * lit(0.3)
  }

  /** Position-aware document fingerprint: XOR of hash32(token ∥ ':' ∥ pos)
    * over all tokens — order-sensitive (a permuted document fingerprints
    * differently), mergeable, and a single aggregate at any scale. */
  def fingerprint(w: Column): Column =
    aggregate(
      transform(w, (t, i) => TextOps.hash32(concat_ws(":", t, i.cast("string")))),
      lit(0L), (acc, h) => acc.bitwiseXOR(h))

  /** TF-IDF over whitespace tokens: per-(doc, term) frequency joined to
    * per-term document frequency, idf = ln((N+1)/(df+1)) (smoothed — never
    * log 0). Two shuffles, both on hash-partitionable keys ((doc, term)
    * then term), and the corpus-size scalar joins as a broadcast 1-row
    * cross — the classic featurization shape at any corpus size. Rounded
    * to 6 decimals per the transcendental-parity rule. */
  def tfidf(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 6))
      .drop("n_docs")
  }
}
