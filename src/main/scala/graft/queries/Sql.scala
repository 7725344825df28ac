package graft.queries

import graft.util.Parity

/** DuckDB-dialect oracle SQL fragments mirroring [[graft.util.Parity]]
  * column expressions — the two must stay in lockstep for hash parity.
  */
object Sql {
  /** Oracle twin of [[Parity.dsum]]. */
  def dsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(28,4))) AS DOUBLE)"
  /** Oracle twin of [[Parity.dsum6]]. */
  def dsum6(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"
  /** Oracle twin of [[Parity.davg]]. */
  def davg(e: String): String = s"${dsum(e)} / COUNT($e)"
  /** Oracle twin of [[Parity.dvar]] — identical double-op shape. */
  def dvar(e: String): String = {
    val n  = s"CAST(COUNT($e) AS DOUBLE)"
    val s1 = dsum(e)
    val s2 = s"CAST(SUM(CAST(($e) * ($e) AS DECIMAL(38,6))) AS DOUBLE)"
    s"(($s2) - ($s1) * ($s1) / ($n)) / (($n) - 1.0)"
  }
  /** Oracle twin of [[Parity.keyHash]]. */
  def keyHash(col: String): String = Parity.keyHashSql(col)

  /** Oracle twin of [[Parity.dcorr]] — identical double-op shape over the
    * five exact decimal moments. */
  def dcorr(x: String, y: String): String = {
    val n   = "CAST(COUNT(*) AS DOUBLE)"
    val sx  = dsum(x)
    val sy  = dsum(y)
    val sxx = s"CAST(SUM(CAST(($x) * ($x) AS DECIMAL(38,6))) AS DOUBLE)"
    val syy = s"CAST(SUM(CAST(($y) * ($y) AS DECIMAL(38,6))) AS DOUBLE)"
    val sxy = s"CAST(SUM(CAST(($x) * ($y) AS DECIMAL(38,6))) AS DOUBLE)"
    s"(($n) * ($sxy) - ($sx) * ($sy)) / (sqrt(($n) * ($sxx) - ($sx) * ($sx)) * sqrt(($n) * ($syy) - ($sy) * ($sy)))"
  }

  /** DuckDB type-7 (numpy-default linear interpolation) quantile over a
    * sorted DOUBLE[] `ls` of fixed width `n` — twin of
    * [[graft.matrix.ArrayOps.rowQuantile]] /
    * [[graft.relational.StatsProjection.quantileType7]]. */
  def q7(ls: String, n: Int, q: Double): String = {
    val pos = (n - 1) * q
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    s"($ls[${lo + 1}] + ($ls[${hi + 1}] - $ls[${lo + 1}]) * ($pos - $lo.0))"
  }
}
