package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine numeric determinism helpers.
  *
  * The correctness gate hash-compares our results against a DuckDB oracle.
  * Row-level double arithmetic is deterministic across engines (same IEEE-754
  * ops on the same inputs), but *aggregation* of doubles is not: partial sums
  * combine in partition order, so `SUM(double)` differs in low bits between
  * Spark (32-way parallel) and DuckDB. Two strategies:
  *
  *  1. [[dsum]] — route sums through exact DECIMAL arithmetic: cast each value
  *     to DECIMAL (correctly-rounded, identical in both engines on non-midpoint
  *     doubles), sum exactly, cast the final decimal back to double
  *     (correctly-rounded again). Order-independent, bit-identical.
  *  2. [[r6]] — for order-based computations whose float error is ~1e-12
  *     (percentile interpolation, per-row math), coarse rounding.
  *
  * Scale 4 is used so no realistic data double lands on a binary-representable
  * decimal midpoint (where Spark's HALF_UP and DuckDB's rounding could split).
  */
object Parity {
  /** Exact-decimal sum of a double column, returned as double.
    * Oracle SQL equivalent: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE)`.
    */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 4))).cast("double")

  /** Exact-decimal sum at scale 6 — for already-multiplied row expressions
    * like `price * (1 - disc)` that carry more fractional digits.
    * Oracle: `CAST(SUM(CAST(expr AS DECIMAL(28,6))) AS DOUBLE)`.
    */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(28, 6))).cast("double")

  /** Deterministic average: exact-decimal sum divided by count.
    * Oracle: `CAST(SUM(CAST(x AS DECIMAL(28,4))) AS DOUBLE) / COUNT(x)`.
    */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Deterministic sample variance from exact decimal moments:
    * (Σx² − (Σx)²/n) / (n−1), with both sums exact and the final arithmetic
    * identical double ops in both engines.
    * Oracle: same formula spelled out over decimal sums.
    */
  def dvar(c: Column): Column = {
    val n  = count(c).cast("double")
    val s  = sum(c.cast(DecimalType(28, 4))).cast("double")
    val s2 = sum((c * c).cast(DecimalType(38, 6))).cast("double")
    (s2 - s * s / n) / (n - lit(1.0))
  }

  /** Deterministic Pearson correlation from exact decimal moments:
    * (n·Σxy − Σx·Σy) / √(n·Σx² − (Σx)²) / √(n·Σy² − (Σy)²). The five sums
    * are exact decimals, the final arithmetic identical IEEE-754 double
    * ops in both engines — unlike built-in `corr`, whose double
    * accumulation is partition-order dependent.
    * Oracle twin: [[graft.queries.Sql.dcorr]]. */
  def dcorr(x: Column, y: Column): Column = {
    val n   = count(lit(1)).cast("double")
    val sx  = sum(x.cast(DecimalType(28, 4))).cast("double")
    val sy  = sum(y.cast(DecimalType(28, 4))).cast("double")
    val sxx = sum((x * x).cast(DecimalType(38, 6))).cast("double")
    val syy = sum((y * y).cast(DecimalType(38, 6))).cast("double")
    val sxy = sum((x * y).cast(DecimalType(38, 6))).cast("double")
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** Coarse rounding for near-identical doubles (|err| ≲ 1e-10). */
  def r6(c: Column): Column = round(c, 6)

  /** Portable deterministic pseudo-hash of a long key: `(k * PRIME) % MOD`,
    * plain 64-bit integer arithmetic identical in Spark and DuckDB SQL.
    * Used for seeded-split / fold-assignment / sampling semantics where
    * engine-native RNGs can't match across engines (SURVEY §7.2.5).
    */
  val HashPrime = 2654435761L
  val HashMod   = 1000000007L
  def keyHash(c: Column): Column =
    pmod(pmod(c.cast("long"), lit(HashMod)) * lit(HashPrime), lit(HashMod))
  /** Oracle SQL for [[keyHash]] (key reduced mod first so the product can
    * never overflow DuckDB's checked BIGINT multiply). The inner `+ M) % M`
    * matches Spark's sign-free `pmod` for negative keys — DuckDB's `%` is
    * sign-preserving, and the outer modulus of a non-negative product is
    * already non-negative in both engines. */
  def keyHashSql(col: String): String =
    s"(((($col % $HashMod + $HashMod) % $HashMod) * $HashPrime) % $HashMod)"
}
