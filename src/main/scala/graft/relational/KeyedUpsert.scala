package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The shared broadcast-safe keyed-upsert decomposition behind
  * [[Scd.cdcApply]] (replace semantics) and [[IncrementalAgg.merge]]
  * (additive semantics).
  *
  * A FULL OUTER join would express "combine matching keys, pass through
  * the rest of both sides" in one operator, but Spark silently drops
  * broadcast hints on full outer joins — the big side would shuffle. The
  * decomposition keeps the base shuffle-free:
  *  - matched keys: broadcast LEFT OUTER join, payload columns combined
  *    via the caller's `combine(baseCol, deltaCol)` — applied ONLY when a
  *    delta row is present (tracked by a marker column, so a NULL inside
  *    a present delta row is a real value, not "no change");
  *  - delta-only keys: broadcast LEFT SEMI probe of base keys (a second,
  *    key-column-pruned scan of base — cheaper than shuffling it), then a
  *    small-vs-small anti join isolates the fresh rows.
  * The base is scanned (twice, second key-pruned), never shuffled; the
  * delta ships twice as a broadcast.
  *
  * `delta` must carry exactly `base`'s columns; one row per key.
  */
object KeyedUpsert {

  def apply(base: DataFrame, delta: DataFrame, keys: Seq[String],
            combine: (Column, Column) => Column): DataFrame = {
    val cols = base.columns.toSeq
    val payload = cols.filterNot(keys.contains)
    val d = delta
      .select(cols.map(c => col(c).as(s"_d_$c")): _*)
      .withColumn("_d_present", lit(true))
    val joinCond = keys.map(k => base(k) === d(s"_d_$k")).reduce(_ && _)
    val updated = base.join(broadcast(d), joinCond, "left_outer")
      .select(keys.map(k => base(k).as(k)) ++
        payload.map(c =>
          when(d("_d_present"), combine(base(c), d(s"_d_$c")))
            .otherwise(base(c)).as(c)): _*)
    val matched = base.join(broadcast(d), joinCond, "left_semi")
      .select(keys.map(col): _*)
    val mcond = keys.map(k => d(s"_d_$k") === matched(k)).reduce(_ && _)
    val fresh = d.join(broadcast(matched), mcond, "left_anti")
      .select(cols.map(c => col(s"_d_$c").as(c)): _*)
    updated.unionByName(fresh)
  }
}
