package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * `queries`: name → (session, sfDir) → result DataFrame.
  * `oracles`: name → equivalent DuckDB SQL over the same parquet tables
  * (omit a key for non-SQL-expressible ops → rows-only check).
  *
  * Column names AND value determinism must match the oracle exactly —
  * see [[graft.util.Parity]] for the numeric rules.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]

  /** Materialize any derived test inputs this pack's queries read
    * (idempotent — see [[graft.util.Staging]]). Bench/Verify call this
    * before timing so staging cost never pollutes query measurements;
    * queries also self-stage on first touch, so packs work standalone. */
  def stage(spark: SparkSession, sfDir: String): Unit = ()
}
