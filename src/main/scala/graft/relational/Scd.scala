package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch MERGE with slowly-changing-dimension (type 2) history semantics —
  * the upsert shape warehouse dimension maintenance needs, expressed as
  * plain joins + union so it runs on any table format.
  *
  * Given a current-state snapshot and a batch of changed rows, produce
  * the post-merge history:
  *   - unchanged keys keep their open row;
  *   - changed keys get their old row CLOSED (`valid_to` = effective
  *     date, `is_current` = false) and a new OPEN row with the updated
  *     attributes (`valid_from` = effective date).
  *
  * Scale shape: one shuffle join base⋈updates on the key (broadcast when
  * the update batch is small — the common case — so the base table never
  * shuffles), plus a union. No window, no global sort; the update batch
  * is touched twice (probe + new rows), the base exactly once.
  */
object Scd {

  /** @param base    current snapshot, one open row per key
    * @param updates changed rows, same schema as `base`
    * @param keys    business key columns
    * @param baseFrom  `valid_from` to stamp on base rows
    * @param effective `valid_from`/`valid_to` boundary for this batch
    */
  def scd2Apply(base: DataFrame, updates: DataFrame, keys: Seq[String],
                baseFrom: Column, effective: Column): DataFrame = {
    val cols = base.columns.toSeq
    val upKeys = updates.select(keys.map(col): _*)

    // old rows: closed if the key is in the batch, still open otherwise
    val marked = base.join(
        broadcast(upKeys.withColumn("_upd", lit(true))), keys, "left")
      .select(cols.map(col) :+
        baseFrom.as("valid_from") :+
        when(col("_upd"), effective).otherwise(lit(null).cast("date")).as("valid_to") :+
        coalesce(!col("_upd"), lit(true)).as("is_current"): _*)

    val fresh = updates.select(cols.map(col) :+
      effective.as("valid_from") :+
      lit(null).cast("date").as("valid_to") :+
      lit(true).as("is_current"): _*)

    marked.unionByName(fresh)
  }

  /** CDC batch apply (MERGE semantics): fold a change batch with an `op`
    * column (`I` insert / `U` update / `D` delete) into a current-state
    * snapshot. Inserts add new keys, updates replace the payload of
    * existing keys, deletes remove keys. One change row per key.
    *
    * Scale shape: the base table never shuffles. A full-outer join would
    * be the one-join formulation, but Spark cannot broadcast the build
    * side of a full outer join (the hint is silently dropped and the base
    * shuffles), so instead: updates land via a broadcast LEFT OUTER join
    * (supported build-right broadcast); the insert subset of the batch is
    * isolated by a broadcast LEFT SEMI probe of base keys (a second,
    * key-column-pruned scan of base — cheaper than shuffling it) followed
    * by a small-vs-small anti-join; deletes via a broadcast anti-join.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val cols = base.columns.toSeq
    val payload = cols.filterNot(keys.contains)
    val upserts = changes.filter(col("op").isin("I", "U")).drop("op")
      .select(cols.map(c => col(c).as(s"_u_$c")): _*)
    val deletes = changes.filter(col("op") === "D")
      .select(keys.map(col): _*)

    val joinCond = keys.map(k => base(k) === upserts(s"_u_$k")).reduce(_ && _)
    val updated = base.join(broadcast(upserts), joinCond, "left_outer")
      .select(keys.map(k => base(k).as(k)) ++
        payload.map(c => coalesce(upserts(s"_u_$c"), base(c)).as(c)): _*)
    // Keys of the batch that already exist in base: broadcast semi probe,
    // output is at most |changes| rows, itself broadcastable.
    val matched = base.join(broadcast(upserts), joinCond, "left_semi")
      .select(keys.map(col): _*)
    val mcond = keys.map(k => upserts(s"_u_$k") === matched(k)).reduce(_ && _)
    val inserts = upserts.join(broadcast(matched), mcond, "left_anti")
      .select(cols.map(c => col(s"_u_$c").as(c)): _*)
    updated.unionByName(inserts)
      .join(broadcast(deletes), keys, "left_anti")
  }
}
