package graft.util

import org.apache.spark.sql.DataFrame

/** Side-channel for ML differential oracles (the reference's correctness
  * scheme is side-by-side score agreement,
  * `singlemachine_dataset_samplewise_benchmark.py:47-59`).
  *
  * A model's predictions are deterministic (seeded fits, hash splits, fixed
  * partitioning) but not SQL-derivable — DuckDB can't run the model. So an
  * ML query *dumps its own prediction rows* to parquet here, and its oracle
  * SQL recomputes the claimed metric (accuracy, R², per-fold scores) from
  * that dump with plain SQL plus independently SQL-derived facts (split /
  * fold sizes from the hash-split replay). A broken evaluator, wrong split,
  * or non-deterministic fit then hash-mismatches at the driver gate.
  *
  * Oracle SQL references dumps via the `__DUMPDIR__` token; [[graft.Verify]]
  * pins the directory inside its own outDir and substitutes the token when
  * writing `oracle_sql.json`, so the DuckDB process reads from the same
  * directory tree it already reads result parquets from.
  */
object OracleDump {
  val Token = "__DUMPDIR__"

  /** Resolved at call time: Verify pins this to `<outDir>/_oracle_dumps`. */
  def dir: String = sys.props.getOrElse("graft.oracle.dir", "/tmp/graft_oracle")

  /** Write `df` as a single-file parquet dump and return it (for chaining
    * into the metric computation, guaranteeing metric and dump agree on the
    * same rows). */
  def dump(df: DataFrame, name: String): DataFrame = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    df
  }

  /** Oracle-side reader for a dump written by [[dump]]. */
  def sqlGlob(name: String): String = s"read_parquet('$Token/$name/*.parquet')"
}
