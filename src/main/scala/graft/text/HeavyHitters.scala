package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters with a WORST-CASE soundness certificate
  * (SURVEY §2 heavy-hitter family; upgraded round 7 from a concentration
  * heuristic per the round-6 review).
  *
  * Pass 1 counts tokens on a deterministic keyHash doc sample and keeps
  * the top `candCap` as candidates; pass 2 exact-counts ONLY candidates
  * (broadcast anti/semi prefilter — the long-tail vocabulary never
  * enters the shuffle, which at corpus scale IS the aggregation cost).
  * The result is exact iff candidates ⊇ the true top-k. The oracle
  * verifies that at test scale; at 100 TB no oracle exists, so the query
  * must CERTIFY it at runtime.
  *
  * The certificate: every occurrence of every NON-candidate token is
  * streamed through a Count-Min sketch (`rows` independent portable
  * hashes × `width` cells, built by an ordinary partial-aggregated
  * groupBy — fixed size regardless of corpus size). CMS counters only
  * increment, so for every tail token t and every row r,
  * `cell(r, h_r(t)) ≥ count(t)`, hence `max cell of row r ≥ count(t)`
  * for ALL t, hence `ub = min over rows of (max cell)` is a hard upper
  * bound on the true count of EVERY token outside the candidate set —
  * deterministic, no distributional assumption. `sound = (k-th exact
  * candidate count ≥ ub)` therefore PROVES the top-k is exact. The
  * converse direction degrades gracefully: heavy hash collisions (an
  * undersized sketch at huge tail volume) can only raise `ub` and flip
  * `sound` to false — "cannot certify", never a false certificate; the
  * remedies are a wider sketch or a higher sample rate.
  */
object HeavyHitters {

  /** (token, n, tail_ub, sound) — the exact top-k by full-corpus count
    * among sampled candidates, the certified tail upper bound, and the
    * certificate bit. Deterministic: sample by keyHash, ties broken by
    * token. */
  def topKCertified(docs: DataFrame, textCol: Column, docIdCol: Column,
                    k: Int = 25, candCap: Int = 400,
                    sampleTenths: Int = 3, rows: Int = 4,
                    width: Int = 65536): DataFrame = {
    val tokens = docs.select(docIdCol.as("doc_id"),
      explode(TextOps.words(textCol)).as("token"))
    val cands = tokens
      .filter(pmod(graft.util.Parity.keyHash(col("doc_id")), lit(10)) < sampleTenths)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(candCap)
    // CMS over the tail: explode each tail occurrence into `rows` (r,
    // cell) pairs; groupBy(r, cell) partial-aggregates map-side into at
    // most rows×width cells per partition — the shuffle carries sketch
    // cells, never tail tokens.
    val tailUb = tokens.join(broadcast(cands), Seq("token"), "left_anti")
      .select(explode(sequence(lit(0), lit(rows - 1))).as("r"), col("token"))
      .select(col("r"),
        (TextOps.hash32(concat(col("r").cast("string"), lit(":"), col("token"))) % width).as("cell"))
      .groupBy("r", "cell").agg(count(lit(1)).as("c"))
      .groupBy("r").agg(max(col("c")).as("mc"))
      .agg(coalesce(min(col("mc")), lit(0L)).as("tail_ub"))
    val exact = tokens.join(broadcast(cands), "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
    val whole = Window.partitionBy(lit(1))
    exact
      .withColumn("rk", row_number().over(Window.orderBy(col("n").desc, col("token"))))
      .filter(col("rk") <= k)
      .crossJoin(broadcast(tailUb))
      .withColumn("sound", min(col("n")).over(whole) >= col("tail_ub"))
      .select(col("token"), col("n"), col("tail_ub"), col("sound"))
      .orderBy(col("n").desc, col("token"))
  }
}
