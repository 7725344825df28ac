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
    // one change row per key is the caller contract (as for cdcApply);
    // the probe is key-deduped defensively so a duplicated batch key can
    // only duplicate its own open row, never fan out closed copies of
    // the base row
    val upKeys = updates.select(keys.map(col): _*).distinct()

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
    * snapshot. Inserts add new keys, updates REPLACE the payload of
    * existing keys — including explicit NULLs (presence of the change row
    * decides, not non-nullness of each value, so a change can null a
    * column out) — deletes remove keys. One change row per key.
    *
    * Scale shape: the shared [[KeyedUpsert]] broadcast decomposition
    * (base scanned, never shuffled) with replace semantics, plus a
    * broadcast anti-join for deletes.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keys: Seq[String]): DataFrame = {
    val upserts = changes.filter(col("op").isin("I", "U")).drop("op")
      .select(base.columns.toSeq.map(col): _*)
    val deletes = changes.filter(col("op") === "D")
      .select(keys.map(col): _*)
    KeyedUpsert(base, upserts, keys, (_, u) => u)
      .join(broadcast(deletes), keys, "left_anti")
  }
}
