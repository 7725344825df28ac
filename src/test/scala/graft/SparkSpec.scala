package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate → one JVM-wide context). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4, "graft-test")
  def sf(name: String) = s"/root/testdata/$name"

  def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean = {
    val d = math.abs(a - b)
    d <= tol || d <= tol * math.max(math.abs(a), math.abs(b))
  }
}
